package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import SampleStream._

/** Streaming bottom-k sample: a top-k under a total order is
  * order-independent, so the final emission must equal the batch bottom-k
  * under ANY slicing — pinned on the real documents table hashed with the
  * operator's mandated uniform `pmod(xxhash64(...), HashM)` key (NOT the
  * salted charFoldHash, which SampleStream's contract rules out here) —
  * plus checkpoint restart and the bottom-k distinct estimator's
  * exact-below-capacity / bounded-error-at-capacity behavior.
  */
class SampleStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val sf = "/root/testdata/sf0.001"

  /** Hashed rows, computed in the plan with the mandated uniform hash. */
  private def flagged(key: String => String): Vector[SIn] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.sources.Tables.table(spark, sf, "documents")
      .select($"source",
        pmod(xxhash64(concat(lit("bk:"), $"doc_id".cast("string"))),
          lit(HashM)).as("h"),
        $"doc_id".as("id"))
      .as[(String, Long, Long)].collect().toVector
      .map { case (s, h, i) => SIn(key(s), h, i) }
  }

  private def expected(rows: Vector[SIn]): Map[String, SOut] =
    rows.groupBy(_.key).map { case (k, vs) =>
      val picks = vs.map(r => (r.h, r.id)).distinct.sorted.take(K)
      val est =
        if (picks.size < K) picks.size.toLong
        else (K - 1).toLong * HashM / picks.last._1
      k -> SOut(k, vs.size.toLong, est, picks.map(_._2))
    }

  private def run(name: String, chunks: Seq[Seq[SIn]]): Map[String, SOut] = {
    import spark.implicits._
    val mem = MemoryStream[SIn]
    val q = SampleStream.sample(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[SOut].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n_seen) }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("final sample == batch bottom-k, across slicings") {
    val rows = flagged(identity)
    val exp = expected(rows)
    assert(run("bk_one", Seq(rows)) == exp)
    assert(run("bk_five", rows.grouped(rows.size / 5 + 1).toSeq) == exp)
  }

  test("single-key stream at capacity: estimator lands near the truth") {
    val rows = flagged(_ => "all")
    val got = run("bk_all", rows.grouped(97).toSeq)("all")
    assert(got.ids.size == K)
    assert(got.n_seen == rows.size.toLong)
    // bottom-k with k=32 has ~18% relative stddev; ±50% is a safe pin
    // against gross estimator bugs (off-by-modulus, wrong rank)
    val truth = rows.map(_.id).distinct.size.toLong
    assert(got.distinct_est > truth / 2 && got.distinct_est < truth * 2,
      s"est ${got.distinct_est} vs true $truth")
  }

  test("restart from checkpoint resumes the sketch exactly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows = flagged(identity)
    val ckpt = java.nio.file.Files.createTempDirectory("bk_ckpt").toString
    val mem = MemoryStream[SIn]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[SOut]())
    def start() = SampleStream.sample(mem.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SOut], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val q1 = start()
    try { mem.addData(h1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2); q2.processAllAvailable() } finally q2.stop()
    val fin = got.asScala.groupBy(_.key)
      .map { case (k, rs) => k -> rs.maxBy(_.n_seen) }
    assert(fin == expected(rows))
  }
}
