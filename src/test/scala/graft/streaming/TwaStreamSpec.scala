package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import TwaStream._

/** Streaming TWA ≡ the batch q_ts_twa integral: the LAST emission per
  * user equals the batch lead-window computation on event-time-ordered
  * ingest, across micro-batch slicings (the open position carries over
  * batch boundaries), and zero-span users never emit.
  */
class TwaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // the TimeSeriesSpec twa fixture: a held level + burst, a single-obs
  // user, a zero-span user, and a non-purchase row
  private val events: Seq[(Long, Long, Timestamp, String, Double)] = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", 1.00),
    (2L, 1L, ts("2024-01-01 10:00:10"), "purchase", 9.00),
    (3L, 1L, ts("2024-01-01 10:00:11"), "purchase", 9.00),
    (4L, 2L, ts("2024-01-01 10:00:00"), "purchase", 5.00),
    (5L, 3L, ts("2024-01-01 10:00:00"), "purchase", 1.00),
    (6L, 3L, ts("2024-01-01 10:00:00.400"), "purchase", 2.00),
    (7L, 1L, ts("2024-01-01 10:00:05"), "view", 999.0)
  )

  private def batchRows: Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    graft.relational.TimeSeries.twaOf(
        events.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  private def run(chunks: Seq[Seq[(Long, Long, Timestamp, String, Double)]])
      : Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val q = TwaStream.levels(
        mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("twa_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("twa_out").as[TwaRow].collect()
        .groupBy(_.user_id).view
        .mapValues { rs => val m = rs.maxBy(_.n_obs); (m.n_obs, m.span_s, m.twa_cents) }
        .toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS twa_out")
    }
  }

  private val ordered = events.filter(_._4 == "purchase").sortBy(e => (e._3.getTime, e._1))

  test("single batch == batch integral; zero-span and single-obs users never emit") {
    val expect = batchRows
    assert(expect.keySet == Set(1L))
    assert(run(Seq(events)) == expect)
  }

  test("one event per micro-batch: the open position carries across batches") {
    assert(run(ordered.map(Seq(_))) == batchRows)
  }

  test("uneven slicing mid-interval == batch integral") {
    val (a, b) = ordered.splitAt(3)
    assert(run(Seq(a, b)) == batchRows)
  }
}
