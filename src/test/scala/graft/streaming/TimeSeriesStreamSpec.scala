package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.relational.TimeSeries
import TimeSeriesStream._

/** Streaming ≡ batch for the volume-spike detector: the planted-spike
  * fixture driven through MemoryStream across micro-batch slicings, with
  * watermark-gated sealing (a flag appears only once the watermark passes
  * its bucket end) and zero-gap buckets feeding the trailing window exactly
  * as the batch grid materializes them.
  */
class TimeSeriesStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val H = 3600L * 1000L

  // user 7: 9 flat buckets of 1.00, one silent gap bucket, then a 10.00
  // spike two buckets later — the gap's ZERO enters the trailing window.
  // user 8: warm-up-only large value (must never flag).
  private val base = ts("2024-03-01 00:30:00").getTime
  private val fixture: Seq[(Long, Timestamp, String, Double)] =
    (0 until 9).map(i => (7L, new Timestamp(base + i * 6 * H), "purchase", 1.00)) ++
      Seq((7L, new Timestamp(base + 10L * 6 * H), "purchase", 10.00)) ++
      Seq((8L, ts("2024-03-01 01:00:00"), "purchase", 500.00),
        (8L, ts("2024-03-01 07:00:00"), "purchase", 1.00)) ++
      // noise the operator must filter out
      Seq((7L, new Timestamp(base + 5 * 6 * H), "view", 999.0))

  // two staged far-future rows: the first advances the watermark past every
  // fixture bucket, the second triggers a batch in which the timers fire
  private val flush: Seq[Seq[(Long, Timestamp, String, Double)]] =
    Seq(Seq((99L, ts("2024-06-01 00:00:00"), "purchase", 1.0)),
      Seq((99L, ts("2024-07-01 00:00:00"), "purchase", 1.0)))

  private def batchExpected: Set[TsFlag] = {
    import spark.implicits._
    TimeSeries.anomalyOf(fixture.toDF("user_id", "ts", "event_type", "value"))
      .as[(Long, Timestamp, Long, Long)].collect()
      .map(r => TsFlag(r._1, r._2.getTime, r._3, r._4)).toSet
  }

  private def run(chunks: Seq[Seq[(Long, Timestamp, String, Double)]]): Set[TsFlag] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = TimeSeriesStream.anomaly(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), "0 seconds")
      .writeStream.format("memory").queryName("ts_out").outputMode("append").start()
    try {
      (chunks ++ flush).foreach { c =>
        if (c.nonEmpty) mem.addData(c: _*)
        q.processAllAvailable()
      }
      spark.table("ts_out").as[TsFlag].collect().toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ts_out")
    }
  }

  test("streaming flags == batch flags, invariant to micro-batch slicing") {
    val expect = batchExpected
    assert(expect.nonEmpty && expect.forall(_.user_id == 7L)) // fixture sanity
    assert(run(Seq(fixture)) == expect)
    assert(run(Seq(fixture.take(5), fixture.slice(5, 9), fixture.drop(9))) == expect)
  }

  test("out-of-order arrival above the watermark still seals correctly") {
    // deliver the spike's PRECEDING flat buckets after later ones within
    // one micro-batch, and split buckets across batches out of order
    val shuffled = scala.util.Random.shuffle(fixture.take(9)) ++ fixture.drop(9)
    assert(run(Seq(shuffled)) == batchExpected)
  }

  test("query restart from checkpoint preserves open buckets and the ring") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("ts_ckpt").toString
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[TsFlag]())
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def start() = TimeSeriesStream.anomaly(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), "0 seconds")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TsFlag], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: the flat history only — everything goes into state, no flag
    val q1 = start()
    try {
      mem.addData(fixture.take(9): _*)
      q1.processAllAvailable()
      assert(got.isEmpty)
    } finally q1.stop()

    // run 2 (fresh query, same checkpoint): the spike + watermark advance
    // can only flag with tsum = 700 if the trailing ring and open buckets
    // survived the restart
    val q2 = start()
    try {
      mem.addData(fixture.drop(9): _*)
      q2.processAllAvailable()
      flush.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
      assert(got.asScala.toSet == batchExpected, got.toString)
    } finally q2.stop()
  }

  test("nothing emits before the watermark passes the spike bucket") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = TimeSeriesStream.anomaly(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), "0 seconds")
      .writeStream.format("memory").queryName("ts_gate").outputMode("append").start()
    try {
      mem.addData(fixture: _*); q.processAllAvailable()
      // watermark is still at the fixture max minus delay from the PREVIOUS
      // batch at emission time — the spike bucket can't have sealed in the
      // very first batch (wm starts at 0)
      val afterFirst = spark.table("ts_gate").count()
      assert(afterFirst == 0L, s"emitted $afterFirst before watermark advance")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ts_gate")
    }
  }
}
