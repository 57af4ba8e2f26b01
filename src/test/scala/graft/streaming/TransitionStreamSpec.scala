package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import TransitionStream._

/** Streaming transition pairs ≡ the batch q_path_transitions matrix: the
  * aggregated streaming pair counts must equal the batch lag-window
  * extraction on event-time-ordered ingest, across micro-batch slicings
  * (state carries the last event over batch boundaries).
  */
class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events: Seq[(Long, Timestamp, String, Long)] = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view", 1L),
    (1L, ts("2024-01-01 10:05:00"), "click", 2L),
    (1L, ts("2024-01-01 10:15:00"), "view", 3L),
    (1L, ts("2024-01-01 12:15:00"), "click", 4L), // 2h gap: no transition
    (1L, ts("2024-01-01 12:20:00"), "purchase", 5L),
    (2L, ts("2024-01-01 09:00:00"), "view", 6L),
    (2L, ts("2024-01-01 09:01:00"), "purchase", 7L)
  )

  private def batchCounts: Map[(String, String), Long] = {
    import spark.implicits._
    graft.relational.Paths.transitionsOf(
        events.toDF("user_id", "ts", "event_type", "event_id"))
      .select("src", "dst", "cnt")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  private def run(chunks: Seq[Seq[(Long, Timestamp, String, Long)]]): Map[(String, String), Long] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val q = TransitionStream.transitions(
        mem.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.format("memory").queryName("tr_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("tr_out").as[Transition].collect()
        .groupBy(t => (t.src, t.dst)).view.mapValues(_.size.toLong).toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS tr_out")
    }
  }

  test("streaming pair counts == batch matrix, across micro-batch slicings") {
    val expect = batchCounts
    assert(expect.nonEmpty)
    assert(run(Seq(events)) == expect)
    // the user-1 sequence split so transitions span batch boundaries
    assert(run(Seq(events.take(2), events.slice(2, 5), events.drop(5))) == expect)
    assert(run(events.map(Seq(_))) == expect)
  }

  test("gap_s rides along and respects the session bound") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val q = TransitionStream.transitions(
        mem.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.format("memory").queryName("tr_gap").outputMode("append").start()
    try {
      mem.addData(events.filter(_._1 == 1L): _*)
      q.processAllAvailable()
      val got = spark.table("tr_gap").as[Transition].collect().toSet
      assert(got == Set(
        Transition(1L, "view", "click", 300L),
        Transition(1L, "click", "view", 600L),
        Transition(1L, "click", "purchase", 300L)), got.toString)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS tr_gap")
    }
  }
}
