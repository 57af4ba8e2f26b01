package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EwmaStream._

/** Streaming EWMA ≡ the batch q_ts_ewma fold: the LAST emission per user
  * must equal the batch integer fold on event-time-ordered ingest, across
  * micro-batch slicings (the smoothed level carries over batch
  * boundaries), and intermediate emissions are the prefix folds.
  */
class EwmaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // the TimeSeriesSpec ewma fixture: shuffled order within user 1, an
  // event_id tie-break for user 2, per-step flooring for user 3, and a
  // non-purchase row that must not enter
  private val events: Seq[(Long, Long, Timestamp, String, Double)] = Seq(
    (3L, 1L, ts("2024-01-01 12:00:00"), "purchase", 6.00),
    (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", 8.00),
    (2L, 1L, ts("2024-01-01 11:00:00"), "purchase", 4.00),
    (5L, 2L, ts("2024-01-02 09:00:00"), "purchase", 1.00),
    (6L, 2L, ts("2024-01-02 09:00:00"), "purchase", 2.00),
    (7L, 3L, ts("2024-01-03 00:00:00"), "purchase", 0.01),
    (8L, 3L, ts("2024-01-03 01:00:00"), "purchase", 0.00),
    (9L, 3L, ts("2024-01-03 02:00:00"), "purchase", 0.00),
    (4L, 1L, ts("2024-01-01 13:00:00"), "view", 999.0)
  )

  private def batchRows: Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    graft.relational.TimeSeries.ewmaOf(
        events.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  /** Runs the stream in the given chunkings (event-time order across
    * chunks) and returns the LAST emission per user. */
  private def run(chunks: Seq[Seq[(Long, Long, Timestamp, String, Double)]])
      : Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val q = EwmaStream.levels(
        mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("ewma_out").as[EwmaRow].collect()
        .groupBy(_.user_id).view
        .mapValues(rs => { val m = rs.maxBy(_.n_obs); (m.n_obs, m.ewma_micro, m.last_cents) })
        .toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ewma_out")
    }
  }

  // event-time-ordered ingest (the streaming ordering contract)
  private val ordered = events.filter(_._4 == "purchase").sortBy(e => (e._3.getTime, e._1))

  test("single batch == batch fold") {
    val expect = batchRows
    assert(expect.nonEmpty)
    assert(run(Seq(events)) == expect)
  }

  test("one event per micro-batch: state carries the level across batches") {
    assert(run(ordered.map(Seq(_))) == batchRows)
  }

  test("uneven slicing mid-user == batch fold") {
    val (a, b) = ordered.splitAt(4)
    assert(run(Seq(a, b)) == batchRows)
  }

  test("intermediate emissions are the prefix folds") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val q = EwmaStream.levels(
        mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ewma_pre").outputMode("append").start()
    try {
      // user 1 ordered: 8.00, 4.00, 6.00 — prefixes 8e8, 7e8, 675e6
      val u1 = ordered.filter(_._2 == 1L)
      u1.foreach { e => mem.addData(e); q.processAllAvailable() }
      val got = spark.table("ewma_pre").as[EwmaRow].collect().sortBy(_.n_obs).toSeq
      assert(got == Seq(
        EwmaRow(1L, 1L, 800000000L, 800L),
        EwmaRow(1L, 2L, 700000000L, 400L),
        EwmaRow(1L, 3L, 675000000L, 600L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ewma_pre")
    }
  }
}
