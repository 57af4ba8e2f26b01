package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import CusumStream._

/** Streaming CUSUM ≡ the batch q_ts_cusum: the LAST emission per user
  * equals the batch fold on event-time-ordered ingest, across micro-batch
  * slicings — including a slice through the calibration window (the μ
  * buffer must survive batch boundaries) and a slice right at a breach.
  */
class CusumStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // the TimeSeriesSpec cusum fixture: a sustained shift (user 1 breaches
  // at post-calibration index 9), a stable user (never flags), and a
  // too-short user (excluded)
  private def series(uid: Long, vals: Seq[Double], id0: Long) =
    vals.zipWithIndex.map { case (v, i) =>
      (id0 + i, uid, ts(f"2024-01-01 ${i}%02d:00:00"), "purchase", v) }
  private val events =
    series(1L, Seq.fill(5)(10.00) ++ Seq.fill(10)(16.00), 100L) ++
    series(2L, Seq.fill(5)(10.00) ++ Seq(10.50, 9.50, 10.00, 11.00, 9.00), 200L) ++
    series(3L, Seq.fill(5)(10.00), 300L)

  private def batchRows: Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    graft.relational.TimeSeries.cusumOf(
        events.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  private def run(chunks: Seq[Seq[(Long, Long, Timestamp, String, Double)]])
      : Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val q = CusumStream.monitor(
        mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("cusum_out").as[CusumRow].collect()
        .groupBy(_.user_id).view
        .mapValues { rs =>
          val m = rs.maxBy(_.n_obs)
          (m.n_obs, m.mu_cents, m.s_max, m.breach_at)
        }.toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cusum_out")
    }
  }

  private val ordered = events.sortBy(e => (e._3.getTime, e._1))

  test("single batch == batch fold; uncalibrated users emit nothing") {
    val expect = batchRows
    assert(expect.keySet == Set(1L, 2L))
    assert(run(Seq(events)) == expect)
  }

  test("one event per micro-batch: calibration buffer and S survive batches") {
    assert(run(ordered.map(Seq(_))) == batchRows)
  }

  test("slices through the calibration window and at the breach == batch") {
    // user 1's calibration ends at its 5th event and breaches at post
    // index 9; cut mid-calibration (3) and right after the breach region
    val cuts = Seq(ordered.take(3), ordered.slice(3, 20), ordered.drop(20))
    assert(cuts.map(_.size).sum == ordered.size)
    assert(run(cuts) == batchRows)
  }
}
