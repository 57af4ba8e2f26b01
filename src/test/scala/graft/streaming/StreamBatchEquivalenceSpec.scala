package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Cep, EventPatterns}
import graft.pattern.NFA

case class Out(kind: String, user_id: Long, startMs: Long, endMs: Long)

/** Batch CEP ≡ streaming CEP on the real events table (SURVEY.md §5.2 item
  * 3), plus the side-output replacement: one tagged stream split into two
  * sinks with foreachBatch.
  *
  * Note the end-of-input contract difference (SURVEY.md §7.4): batch flushes
  * un-expired partials as timeouts when input ends; a stream never "ends",
  * so streaming only emits timeouts whose deadline the watermark passed. The
  * equivalence below therefore compares matches exactly, and checks
  * streaming timeouts are exactly the batch timeouts with expired deadlines.
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  import EventPatterns.EventRow

  private def loadEvents(): Seq[EventRow] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .as[EventRow].collect().toSeq.sortBy(e => (e.ts_us, e.event_id))
  }

  private def batchRun(events: Seq[EventRow]): (Set[Out], Set[Out]) = {
    import spark.implicits._
    val ds = spark.createDataset(events)
    val out = Cep.matchPattern[Long, EventRow, Out](
      ds, _.user_id, _.ts_us / 1000L, EventPatterns.pattern,
      Seq($"ts_us", $"event_id"))(
      (k, m) => Some(Out("match", k, m.startTs, m.endTs)),
      (k, t) => Some(Out("timeout", k, t.startTs, t.deadline))).collect().toSet
    (out.filter(_.kind == "match"), out.filter(_.kind == "timeout"))
  }

  test("streaming matches == batch matches; streaming timeouts == batch timeouts past watermark") {
    import spark.implicits._
    val events = loadEvents()
    val (bMatches, bTimeouts) = batchRun(events)
    assert(bMatches.nonEmpty && bTimeouts.nonEmpty)

    val input = MemoryStream[EventRow]
    val timed = input.toDS()
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[EventRow]
    val result = CepStream.matchPattern[Long, EventRow, Out](
      timed, _.user_id, _.ts_us / 1000L, EventPatterns.pattern,
      (k, m: NFA.PatternMatch[EventRow]) => Some(Out("match", k, m.startTs, m.endTs)),
      (k, t: NFA.PatternTimeout[EventRow]) => Some(Out("timeout", k, t.startTs, t.deadline)))
    val q = result.writeStream.format("memory").queryName("equiv")
      .outputMode("append").start()
    try {
      // three staged batches, split mid-stream
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }

      val got = spark.table("equiv").as[Out].collect().toSet
      val gotMatches = got.filter(_.kind == "match")
      val gotTimeouts = got.filter(_.kind == "timeout")

      assert(gotMatches == bMatches)
      // final watermark = max event ts (0s delay); only deadlines <= it fired
      val wm = events.map(_.ts_us / 1000L).max
      assert(gotTimeouts == bTimeouts.filter(_.endMs <= wm))
    } finally q.stop()
  }

  test("foreachBatch splits the tagged stream into separate match/timeout sinks") {
    import spark.implicits._
    val matches = collection.mutable.Set.empty[Out]
    val timeouts = collection.mutable.Set.empty[Out]
    val events = loadEvents().take(300)

    val input = MemoryStream[EventRow]
    val timed2 = input.toDS()
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[EventRow]
    val result = CepStream.matchPattern[Long, EventRow, Out](
      timed2,
      _.user_id, _.ts_us / 1000L, EventPatterns.pattern,
      (k, m: NFA.PatternMatch[EventRow]) => Some(Out("match", k, m.startTs, m.endTs)),
      (k, t: NFA.PatternTimeout[EventRow]) => Some(Out("timeout", k, t.startTs, t.deadline)))
    val q = result.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Out], _: Long) =>
        matches ++= batch.filter(_.kind == "match").collect()
        timeouts ++= batch.filter(_.kind == "timeout").collect()
        (): Unit
      }
      .outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      assert(timeouts.nonEmpty)
      assert(matches.forall(_.kind == "match") && timeouts.forall(_.kind == "timeout"))
    } finally q.stop()
  }
}
