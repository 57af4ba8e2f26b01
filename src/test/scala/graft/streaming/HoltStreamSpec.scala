package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import HoltStream._

/** Streaming ≡ batch for the Holt–Winters forecaster: once every observed
  * day has sealed, the LAST emission per user must be bit-identical to
  * the batch fold over the same events — under any micro-batch slicing,
  * including out-of-order delivery above the watermark — on the REAL
  * events table; plus watermark gating (nothing emits before a day can
  * seal) and the gap-day zero-fill contract.
  */
class HoltStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val flush: Seq[Seq[(Long, Timestamp, String, Double)]] =
    Seq(Seq((999999L, ts("2025-06-01 00:00:00"), "purchase", 1.0)),
      Seq((999999L, ts("2025-07-01 00:00:00"), "purchase", 1.0)))

  /** Final emission per user (highest n_days wins; sentinel excluded).
    * `delay` must cover the fixture's out-of-orderness: with real events
    * sliced arbitrarily, a sub-span delay makes the framework drop late
    * rows (correct streaming semantics, but then parity with the batch
    * fold over ALL rows cannot hold — a corpus-spanning delay states the
    * slicing-invariance contract exactly). */
  private def run(chunks: Seq[Seq[(Long, Timestamp, String, Double)]],
      delay: String): Map[Long, HwRow] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = HoltStream.forecasts(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), delay)
      .writeStream.format("memory").queryName("hw_out").outputMode("append").start()
    try {
      (chunks ++ flush).foreach { c =>
        if (c.nonEmpty) mem.addData(c: _*)
        q.processAllAvailable()
      }
      spark.table("hw_out").as[HwRow].collect()
        .filter(_.user_id != 999999L)
        .groupBy(_.user_id).map { case (k, rs) => k -> rs.maxBy(_.n_days) }
        .toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hw_out")
    }
  }

  test("final emissions == batch fold on the real events table, any slicing") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_type", $"value")
      .as[(Long, Timestamp, String, Double)].collect().toIndexedSeq
    val want = graft.relational.TimeSeries.holtWintersOf(
        events.toDF("user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> HwRow(r._1, r._2, r._3, r._4, r._5, r._6)).toMap
    assert(want.nonEmpty)
    // one shot with zero delay (arrival order within one batch is free)
    assert(run(Seq(events), "0 seconds") == want)
    // arbitrary slicing + shuffling under a corpus-spanning delay: no row
    // is ever late, so the emissions must be slicing-invariant
    val shuffled = new scala.util.Random(7).shuffle(events)
    assert(run(Seq(shuffled.take(50), shuffled.slice(50, 300),
      shuffled.drop(300)), "45 days") == want)
  }

  test("restart from checkpoint resumes the register exactly") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // 8 consecutive days split across TWO query incarnations sharing one
    // checkpoint: the [l, b, s×7] register, the open-day map, and the
    // armed timer must all survive the restart — the final emission must
    // equal the uninterrupted batch fold
    val rows = (0 until 8).map(d =>
      (1L, ts(f"2024-04-${d + 1}%02d 09:00:00"), "purchase", (d + 1).toDouble))
    val ckpt = java.nio.file.Files.createTempDirectory("hw_ckpt").toString
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[HwRow]())
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    def start() = HoltStream.forecasts(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), "0 seconds")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HwRow], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try { mem.addData(rows.take(5): _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      mem.addData(rows.drop(5): _*); q2.processAllAvailable()
      mem.addData((999999L, ts("2025-01-01 00:00:00"), "purchase", 1.0))
      q2.processAllAvailable()
      mem.addData((999999L, ts("2025-02-01 00:00:00"), "purchase", 1.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val fin = got.asScala.filter(_.user_id == 1L).maxBy(_.n_days)
    val want = graft.relational.TimeSeries.holtWintersOf(
        rows.toDF("user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(fin == HwRow(want._1, want._2, want._3, want._4, want._5, want._6))
    assert(fin.n_days == 8L)
  }

  test("late rows below sealed days: forecasts unchanged, drop counted") {
    import spark.implicits._
    // The documented drop contract, executable (r10 verdict #6, the
    // DedupStream re-admit pin's shape): a row below the watermark — and
    // therefore below every sealed day, since sealing never runs ahead of
    // the watermark — is dropped by the framework BEFORE the processor
    // and counted in numRowsDroppedByWatermark; the processor's own
    // b >= next guard is the defensive second line. Emissions must be
    // bit-identical with and without the late row.
    val base = (1 to 10).map(d =>
      (1L, ts(f"2024-03-$d%02d 12:00:00"), "purchase", d.toDouble))
    val adv = (1L, ts("2024-03-10 13:00:00"), "purchase", 1.0)
    val late = (1L, ts("2024-03-02 12:00:00"), "purchase", 99.0)
    def run(withLate: Boolean): (Seq[HwRow], Long) = {
      val mem = MemoryStream[(Long, Timestamp, String, Double)]
      val q = HoltStream.forecasts(
          mem.toDF().toDF("user_id", "ts", "event_type", "value"), "1 day")
        .writeStream.format("memory").queryName("hw_late")
        .outputMode("append").start()
      try {
        mem.addData(base: _*); q.processAllAvailable()
        mem.addData(adv); q.processAllAvailable()
        if (withLate) { mem.addData(late); q.processAllAvailable() }
        val dropped = q.recentProgress
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .map(_.numRowsDroppedByWatermark).sum
        (spark.table("hw_late").as[HwRow].collect().toSeq.sortBy(_.n_days),
          dropped)
      } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS hw_late"): Unit }
    }
    val (clean, droppedClean) = run(withLate = false)
    val (withL, droppedLate) = run(withLate = true)
    assert(clean.nonEmpty && withL == clean,
      "a late row below sealed days must not change any emission")
    assert(droppedClean == 0L && droppedLate == 1L,
      s"the drop must be counted: clean=$droppedClean late=$droppedLate")
  }

  test("watermark gates emission; interior gap days fold as zero") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase", 1.00),
      (1L, ts("2024-01-03 10:00:00"), "purchase", 3.00)) // day 2 is a gap
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = HoltStream.forecasts(
        mem.toDF().toDF("user_id", "ts", "event_type", "value"), "0 seconds")
      .writeStream.format("memory").queryName("hw_gate").outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
      // watermark sits at the last event — day 3 cannot seal yet, and
      // days 1-2 seal only when a LATER batch's watermark passes them;
      // with this single batch the watermark gate admits days 1 and 2
      val interim = spark.table("hw_gate").as[HwRow].collect()
      assert(interim.forall(_.n_days <= 2), interim.mkString(","))
      mem.addData((999999L, ts("2025-01-01 00:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      mem.addData((999999L, ts("2025-02-01 00:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      val fin = spark.table("hw_gate").as[HwRow].collect()
        .filter(_.user_id == 1L).maxBy(_.n_days)
      val want = graft.relational.TimeSeries.holtWintersOf(
          rows.toDF("user_id", "ts", "event_type", "value"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      assert(fin == HwRow(want._1, want._2, want._3, want._4, want._5, want._6))
      assert(fin.n_days == 3L) // the gap day folded as zero
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hw_gate")
    }
  }
}
