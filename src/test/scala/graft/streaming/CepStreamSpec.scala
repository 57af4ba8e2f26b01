package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.events.BillingEvent
import graft.operators.AlertOutput

/** Streaming CEP: the golden scenario driven through MemoryStream across
  * staged micro-batches, asserting watermark-gated emission (match appears
  * only once the watermark passes it; timeout fires via event-time timer
  * when the watermark passes A.ts + 1h — the 13:30 event's only role).
  */
class CepStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val golden = Seq(
    BillingEvent("1", "2020-05-01 11:00:00", 13, 9),
    BillingEvent("2", "2020-05-01 11:00:00", 11, 6),
    BillingEvent("2", "2020-05-01 11:15:00", 6, 4),
    BillingEvent("2", "2020-05-01 11:30:00", 4, 3),
    BillingEvent("2", "2020-05-01 11:40:00", 3, 23),
    BillingEvent("1", "2020-05-01 11:45:00", 9, 5))
  private val lateTick = BillingEvent("1", "2020-05-01 13:30:00", 5, 25)

  private def startQuery(input: MemoryStream[BillingEvent], name: String): StreamingQuery =
    BillingAlertsStream.detect(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()

  private def rows(name: String): Seq[(String, String, String, String)] = {
    import spark.implicits._
    spark.table(name).as[AlertOutput].collect().toSeq
      .map(o => (o.kind, o.id, o.alarmTriggerDatetime, o.topupDatetime)).sorted
  }

  test("golden scenario end-to-end in one batch sequence") {
    import spark.implicits._
    val input = MemoryStream[BillingEvent]
    val q = startQuery(input, "cep_all")
    try {
      input.addData(golden :+ lateTick)
      q.processAllAvailable()
      assert(rows("cep_all") == Seq(
        ("match", "2", "2020-05-01 11:00:00", "2020-05-01 11:40:00"),
        ("timeout", "1", "2020-05-01 11:00:00", "")))
    } finally q.stop()
  }

  test("staged batches: emission is watermark-gated; timer fires the absence") {
    import spark.implicits._
    val input = MemoryStream[BillingEvent]
    val q = startQuery(input, "cep_staged")
    try {
      // batch 1: events up to 11:30 — watermark still behind everything
      input.addData(golden.take(4))
      q.processAllAvailable()
      assert(rows("cep_staged").isEmpty)

      // batch 2: C arrives (11:40) + key-1 B — watermark (11:34) has passed
      // key 2's A/B events but not C; still no completed match visible
      input.addData(golden.drop(4))
      q.processAllAvailable()
      assert(!rows("cep_staged").exists(_._1 == "match"))

      // batch 3: late tick advances the watermark to 13:24 — match completes
      // and key 1's 12:00 deadline timer fires the absence timeout
      input.addData(Seq(lateTick))
      q.processAllAvailable()
      assert(rows("cep_staged") == Seq(
        ("match", "2", "2020-05-01 11:00:00", "2020-05-01 11:40:00"),
        ("timeout", "1", "2020-05-01 11:00:00", "")))
    } finally q.stop()
  }

  test("late events (behind the watermark) are dropped, not matched") {
    import spark.implicits._
    val input = MemoryStream[BillingEvent]
    val q = startQuery(input, "cep_late")
    try {
      // advance watermark far past noon with an unrelated key
      input.addData(Seq(BillingEvent("9", "2020-05-01 15:00:00", 50, 60)))
      q.processAllAvailable()
      // now a full match arrives for key 2 — but hours behind the watermark
      input.addData(golden.filter(_.id == "2"))
      q.processAllAvailable()
      input.addData(Seq(BillingEvent("9", "2020-05-01 16:00:00", 50, 60)))
      q.processAllAvailable()
      assert(!rows("cep_late").exists(r => r._1 == "match" && r._2 == "2"))
    } finally q.stop()
  }

  test("query restart from checkpoint preserves NFA state across runs") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("cep_ckpt").toString
    val input = MemoryStream[BillingEvent]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String, String, String)]())
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def start() = BillingAlertsStream.detect(input.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AlertOutput], _: Long) =>
        b.collect().foreach(o =>
          got.add((o.kind, o.id, o.alarmTriggerDatetime, o.topupDatetime)))
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: key 2's A + B events only — partial match goes into state
    val q1 = start()
    try {
      input.addData(golden.filter(e => e.id == "2").take(3))
      q1.processAllAvailable()
      assert(got.isEmpty)
    } finally q1.stop()

    // run 2 (fresh query instance, same checkpoint): C + watermark advance
    // complete the match ONLY if the partial survived the restart
    val q2 = start()
    try {
      input.addData(golden.filter(e => e.id == "2").drop(3) :+ lateTick)
      q2.processAllAvailable()
      assert(got.contains(
        ("match", "2", "2020-05-01 11:00:00", "2020-05-01 11:40:00")))
    } finally q2.stop()
  }

  test("until (loop stop) in streaming: micro-batched CepStream ≡ the " +
    "declared q_cep_until batch query on the real sf0.001 events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.EventPatterns
    import EventPatterns.EventRow
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id", $"event_type")
      .as[EventRow].collect()
      .sortBy(e => (e.ts_us, e.event_id)) // the batch adapter's sort order;
      // CepStream's stable equal-ts arrival-order contract makes the feed
      // order the tiebreak, so parity holds through ms-tied events
    val input = MemoryStream[EventRow]
    val timed = input.toDS()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .drop("ets").as[EventRow]
    val out = CepStream.matchPattern[Long, EventRow, (Long, Long, Long, Int)](
      timed, _.user_id, _.ts_us / 1000L, EventPatterns.untilPattern,
      (uid, m) => m.first("S").zip(m.first("P")).map { case (s, p) =>
        (uid, s.ts_us / 1000000L, p.ts_us / 1000000L, m("B").size)
      },
      (_, _) => None)
    val q = out.writeStream.format("memory").queryName("cep_until_stream")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq); q.processAllAvailable()
      }
      // two far-future sentinels flush the watermark buffer + timers
      (1 to 2).foreach { k =>
        input.addData(Seq(EventRow(-k.toLong,
          events.last.ts_us + k * 48L * 3600 * 1000000L, 999999999L, "view")))
        q.processAllAvailable()
      }
      val streamed = spark.table("cep_until_stream")
        .as[(Long, Long, Long, Int)].collect().toSeq.sorted
      val batch = EventPatterns.untilStreak(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
          r.getTimestamp(2).getTime / 1000L, r.getInt(3))).toSeq.sorted
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming until ≠ batch: ${streamed.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("batch and streaming agree on the golden input") {
    import spark.implicits._
    val batchOut = graft.operators.BillingAlerts
      .detect(spark.createDataset(golden :+ lateTick))
      .collect().toSeq
      .map(o => (o.kind, o.id, o.alarmTriggerDatetime, o.topupDatetime)).sorted
    val input = MemoryStream[BillingEvent]
    val q = startQuery(input, "cep_vs_batch")
    try {
      input.addData(golden :+ lateTick)
      q.processAllAvailable()
      assert(rows("cep_vs_batch") == batchOut)
    } finally q.stop()
  }
}
