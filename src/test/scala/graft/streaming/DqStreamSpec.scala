package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.DataQuality
import DqStream._

/** Streaming data-quality monitor: counters add exactly, so the final
  * emission must equal the batch constraint rates under ANY micro-batch
  * slicing — pinned against [[DataQuality.verdictOf]] on the REAL dirty
  * orders registry (same corruption classes, same bp arithmetic), plus
  * checkpoint-restart continuity and per-batch monotonicity.
  */
class DqStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val sf = "/root/testdata/sf0.001"

  /** The dirty registry flagged row-by-row — the plan-side projection the
    * operator contract prescribes (flags in the plan, counts in state),
    * with RI from the broadcast stream-static join shape. */
  private lazy val flagged: Vector[DqIn] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dirty = DataQuality.dirtyOrdersOf(
      graft.sources.Tables.table(spark, sf, "orders"))
    val cust = graft.sources.Tables.table(spark, sf, "customer")
      .select($"c_custkey")
    dirty.join(broadcast(cust), dirty("ckey") === cust("c_custkey"), "left")
      .select(lit("orders").as("src"),
        $"status".isin("O", "F", "P").as("statusOk"),
        $"priority".isNotNull.as("priOk"),
        $"odate".between(lit("1992-01-01").cast("timestamp"),
          lit("2005-12-31").cast("timestamp")).as("dateOk"),
        ($"price" >= 0).as("priceOk"),
        $"c_custkey".isNotNull.as("riOk"))
      .as[DqIn].collect().toVector
  }

  /** The batch suite's measured_bp for the five streamable constraints. */
  private lazy val batchBp: Map[String, Long] = {
    import org.apache.spark.sql.functions.col
    DataQuality.verdictOf(
      DataQuality.dirtyOrdersOf(
        graft.sources.Tables.table(spark, sf, "orders")),
      graft.sources.Tables.table(spark, sf, "customer").select(col("c_custkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def run(name: String, chunks: Seq[Seq[DqIn]]): Map[String, DqOut] = {
    import spark.implicits._
    val mem = MemoryStream[DqIn]
    val q = DqStream.monitor(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[DqOut].collect()
        .groupBy(_.src).map { case (k, rs) => k -> rs.maxBy(_.n) }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("final rates == the batch verdict suite, across slicings") {
    for ((nm, chunks) <- Seq(
        ("dq_one", Seq(flagged)),
        ("dq_five", flagged.grouped(flagged.size / 5 + 1).toSeq))) {
      val got = run(nm, chunks)("orders")
      assert(got.n == flagged.size.toLong)
      assert(got.status_bp == batchBp("accepted_values_status"), nm)
      assert(got.pri_bp == batchBp("completeness_priority"), nm)
      assert(got.date_bp == batchBp("freshness_orderdate"), nm)
      assert(got.price_bp == batchBp("non_negative_price"), nm)
      assert(got.ri_bp == batchBp("referential_custkey"), nm)
    }
  }

  test("per-source keying: a clean source is unaffected by a dirty one") {
    import spark.implicits._
    val clean = Vector.fill(50)(DqIn("clean", true, true, true, true, true))
    val dirty = Vector.fill(40)(DqIn("dirty", false, true, true, true, true)) ++
      Vector.fill(10)(DqIn("dirty", true, true, true, true, true))
    val mem = MemoryStream[DqIn]
    val q = DqStream.monitor(mem.toDS())
      .writeStream.format("memory").queryName("dq_src").outputMode("append").start()
    try {
      mem.addData(clean ++ dirty); q.processAllAvailable()
      val got = spark.table("dq_src").as[DqOut].collect()
        .map(o => o.src -> o).toMap
      assert(got("clean") == DqOut("clean", 50L, 10000L, 10000L, 10000L, 10000L, 10000L))
      assert(got("dirty") == DqOut("dirty", 50L, 2000L, 10000L, 10000L, 10000L, 10000L))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS dq_src")
    }
  }

  test("restart from checkpoint resumes the counters exactly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val ckpt = java.nio.file.Files.createTempDirectory("dq_ckpt").toString
    val mem = MemoryStream[DqIn]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[DqOut]())
    def start() = DqStream.monitor(mem.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[DqOut], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val (h1, h2) = flagged.splitAt(flagged.size / 2)
    val q1 = start()
    try { mem.addData(h1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2); q2.processAllAvailable() } finally q2.stop()
    val fin = got.asScala.groupBy(_.src)
      .map { case (k, rs) => k -> rs.maxBy(_.n) }("orders")
    assert(fin.n == flagged.size.toLong)
    assert(fin.status_bp == batchBp("accepted_values_status"))
    assert(fin.ri_bp == batchBp("referential_custkey"))
  }
}
