package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class MvEvent(user_id: Long, amount: Long)

/** The streaming materialized view: after every micro-batch the published
  * snapshot equals the batch aggregate over all data so far (the dynamic-
  * table contract), epochs only rewrite buckets containing changed keys,
  * and redelivered epochs are skipped.
  */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(): String =
    Files.createTempDirectory("graft-mview").toString

  private def viewRows(out: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    MaterializedView.readView(spark, out)
      .select($"user_id", $"total", $"n").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def expected(evs: Seq[MvEvent]): Map[Long, (Long, Long)] =
    evs.groupBy(_.user_id).view
      .mapValues(g => (g.map(_.amount).sum, g.size.toLong)).toMap

  test("snapshot after every micro-batch == batch aggregate over data so far") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = tmp(); val ckpt = tmp()
    val mem = MemoryStream[MvEvent]
    val agg = mem.toDF().groupBy($"user_id")
      .agg(sum($"amount").as("total"), count(lit(1)).as("n"))
    val q = MaterializedView.start(agg, "user_id", out, ckpt, "mview")
    val chunks = Seq(
      Seq(MvEvent(1L, 10L), MvEvent(2L, 5L), MvEvent(1L, 7L)),
      Seq(MvEvent(2L, 1L), MvEvent(3L, 100L)),
      Seq(MvEvent(1L, 3L), MvEvent(3L, 2L), MvEvent(4L, 9L)))
    try {
      var seen = Seq.empty[MvEvent]
      chunks.foreach { c =>
        mem.addData(c: _*)
        q.processAllAvailable()
        seen ++= c
        assert(viewRows(out) == expected(seen), s"after ${seen.size} events")
      }
    } finally q.stop()
    // version history exists and only changed buckets were rewritten:
    // epoch dirs contain strictly fewer than Buckets subdirs
    val vdirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(vdirs.nonEmpty)
    assert(vdirs.forall(
      _.listFiles().count(_.getName.startsWith("__bucket=")) <= 4))
  }

  test("vacuum drops only unreferenced versions; snapshot unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = tmp()
    // a second key guaranteed to land in a DIFFERENT bucket than key 1, so
    // epoch 1 (touching only key 1) leaves epoch 0 partially live
    def bkt(k: Long): Long = spark.range(1)
      .select(pmod(xxhash64(lit(k)), lit(MaterializedView.Buckets.toLong)))
      .head().getLong(0)
    val k2 = (2L to 64L).find(k => bkt(k) != bkt(1L)).get
    MaterializedView.upsert(
      Seq((1L, 10L, 1L), (k2, 5L, 1L)).toDF("user_id", "total", "n"),
      "user_id", out, 0L)
    MaterializedView.upsert(
      Seq((1L, 17L, 2L)).toDF("user_id", "total", "n"), "user_id", out, 1L)
    assert(MaterializedView.vacuum(out) == Seq.empty)
    // epoch 2 rewrites BOTH keys — v0 and v1 become fully dead
    MaterializedView.upsert(
      Seq((1L, 20L, 3L), (k2, 6L, 2L)).toDF("user_id", "total", "n"),
      "user_id", out, 2L)
    assert(MaterializedView.vacuum(out) == Seq("v0", "v1"))
    assert(viewRows(out) == Map(1L -> (20L, 3L), k2 -> (6L, 2L)))
  }

  test("time travel: every committed epoch reads as its own snapshot") {
    import spark.implicits._
    val out = tmp()
    MaterializedView.upsert(
      Seq((1L, 10L, 1L), (2L, 5L, 1L)).toDF("user_id", "total", "n"),
      "user_id", out, 0L)
    MaterializedView.upsert(
      Seq((1L, 17L, 2L)).toDF("user_id", "total", "n"), "user_id", out, 1L)
    def at(id: Long): Map[Long, (Long, Long)] =
      MaterializedView.readViewAt(spark, out, id)
        .select($"user_id", $"total", $"n").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(at(0L) == Map(1L -> (10L, 1L), 2L -> (5L, 1L)))
    assert(at(1L) == Map(1L -> (17L, 2L), 2L -> (5L, 1L)))
    assert(at(1L) == viewRows(out))
    intercept[IllegalStateException](MaterializedView.readViewAt(spark, out, 9L))
  }

  test("redelivered epoch is skipped; snapshot stays consistent") {
    import spark.implicits._
    val out = tmp()
    val b0 = Seq((1L, 10L, 1L), (2L, 5L, 1L)).toDF("user_id", "total", "n")
    MaterializedView.upsert(b0, "user_id", out, 0L)
    val b1 = Seq((1L, 17L, 2L)).toDF("user_id", "total", "n")
    MaterializedView.upsert(b1, "user_id", out, 1L)
    // redelivery of epoch 1 with corrupt content must be ignored
    MaterializedView.upsert(
      Seq((1L, 999L, 9L)).toDF("user_id", "total", "n"), "user_id", out, 1L)
    assert(viewRows(out) == Map(1L -> (17L, 2L), 2L -> (5L, 1L)))
  }
}
