package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import QuantileStream._

/** Bounded-histogram streaming quantiles: the histogram is exact (only
  * resolution is bucketed), so the final emission must equal a driver-side
  * fold of the same bucketing under ANY micro-batch slicing, and the
  * reported bucket must bracket the true exact quantile — pinned against
  * the real documents table so the contract is checked on production
  * shapes, not a toy.
  */
class QuantileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Vector[QIn] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, sf, "documents")
      .select($"source", $"n_chars").as[(String, Long)]
      .collect().map { case (s, v) => QIn(s, v) }.toVector
  }

  /** Driver-side fold of the same bucketing — the reference answer. */
  private def expected: Map[String, QOut] =
    docs.groupBy(_.key).map { case (k, vs) =>
      val counts = Array.fill(Buckets)(0L)
      vs.foreach(r => counts(bucketOf(r.v)) += 1)
      val n = vs.size.toLong
      k -> QOut(k, n,
        rankBucketLo(counts.toIndexedSeq, n, 1L, 2L),
        rankBucketLo(counts.toIndexedSeq, n, 9L, 10L),
        1L << counts.lastIndexWhere(_ > 0))
    }

  private def run(name: String, chunks: Seq[Seq[QIn]]): Map[String, QOut] = {
    import spark.implicits._
    val mem = MemoryStream[QIn]
    val q = QuantileStream.quantiles(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[QOut].collect()
        .zipWithIndex.groupBy(_._1.key)
        .map { case (k, rs) => k -> rs.maxBy(r => (r._1.n, r._2.toLong))._1 }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("final histogram quantiles == driver fold, across slicings") {
    val exp = expected
    assert(run("qs_one", Seq(docs)) == exp)
    assert(run("qs_four", docs.grouped(docs.size / 4 + 1).toSeq) == exp)
  }

  test("restart from checkpoint preserves the histogram exactly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val ckpt = java.nio.file.Files.createTempDirectory("qs_ckpt").toString
    val mem = MemoryStream[QIn]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[QOut]())
    def start() = QuantileStream.quantiles(mem.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[QOut], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val (h1, h2) = docs.splitAt(docs.size / 2)
    val q1 = start()
    try { mem.addData(h1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2); q2.processAllAvailable() } finally q2.stop()
    val fin = got.asScala.zipWithIndex.groupBy(_._1.key)
      .map { case (k, rs) => k -> rs.maxBy(r => (r._1.n, r._2.toLong))._1 }
    assert(fin == expected)
  }

  test("sharded histograms merge to the unsharded answer exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // each source's values processed on 4 parallel shards (key carries the
    // shard suffix), in several micro-batches so the emission log is deep
    val sharded = docs.zipWithIndex.map { case (r, i) =>
      QIn(s"${r.key}|${i % 4}", r.v)
    }
    val mem = MemoryStream[QIn]
    val q = QuantileStream.histograms(mem.toDS())
      .writeStream.format("memory").queryName("qh_merge").outputMode("append").start()
    try {
      sharded.grouped(sharded.size / 3 + 1).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      val log = spark.table("qh_merge")
        .select(split($"key", "[|]").getItem(0).as("gkey"),
          $"key".as("skey"), $"n", $"counts")
      val merged = QuantileStream.mergeQuantiles(log)
        .as[QOut].collect().map(o => o.key -> o).toMap
      // histogram merge is EXACT: the per-group answer equals the driver
      // fold of the unsharded stream, field for field
      assert(merged == expected, merged.toString)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS qh_merge")
    }
  }

  test("reported bucket brackets the exact rank quantile") {
    val got = run("qs_br", docs.grouped(97).toSeq)
    docs.groupBy(_.key).foreach { case (k, vs) =>
      val sorted = vs.map(_.v).sorted
      val n = sorted.size
      // the same ceil-rank convention, on raw values
      val p50 = sorted(((n + 1) / 2 - 1).max(0))
      val p90 = sorted(((9 * n + 9) / 10 - 1).max(0))
      val o = got(k)
      assert(o.p50_lo <= p50 && p50 < o.p50_lo * 2, s"$k p50 $p50 vs ${o.p50_lo}")
      assert(o.p90_lo <= p90 && p90 < o.p90_lo * 2, s"$k p90 $p90 vs ${o.p90_lo}")
    }
  }
}
