package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.relational.TimeSeries

/** Streaming volume-spike detection — the live twin of the batch
  * `q_ts_anomaly` (`graft.relational.TimeSeries.anomaly`): per user,
  * event-time 6 h buckets close as the WATERMARK passes their end, each
  * closed bucket is compared against its trailing
  * [[TimeSeries.TrailN]]-bucket sum with the same integer
  * cross-multiplication (`cents·N > mult·tsum`), and gap buckets count as
  * ZERO volume exactly as the batch grid materializes them. Alerting is
  * the point of the streaming form: a spike flags as soon as its bucket
  * seals, not at the next nightly batch.
  *
  * Semantics ≡ batch (pinned in `TimeSeriesStreamSpec`): the per-user grid
  * starts at the first observed bucket, interior silence closes as zero
  * buckets feeding the trailing window, warm-up buckets (fewer than
  * [[TimeSeries.TrailN]] predecessors) never flag, and the grid never runs
  * ahead of the data — buckets close only up to the LAST observed bucket,
  * so terminal silence emits nothing and parks the state (a later event
  * first closes the interior zeros lazily, which is also why idle keys arm
  * no timers).
  *
  * State contract at scale: per key ONE small ctrl value (next bucket to
  * close, armed timer, trailing ring of ≤ [[TimeSeries.TrailN]] sums) plus
  * a map of OPEN buckets (above the watermark) — bounded by
  * horizon/bucket, never by stream length; rows below the watermark whose
  * bucket already closed are dropped (the standard late-data contract).
  * Parallelism is the user-key hash partitioning, Flink's keyed scope.
  */
object TimeSeriesStream {

  /** Bucket width in ms — [[TimeSeries.BucketHours]], epoch-aligned like
    * the batch `window()` call. */
  val BucketMs: Long = TimeSeries.BucketHours * 3600L * 1000L

  case class TsPoint(user_id: Long, event_ts: java.sql.Timestamp, vc: Long)
  case class TsFlag(user_id: Long, bstart_ms: Long, cents: Long, tsum: Long)
  /** `next` = next bucket INDEX to close (NoVal before the first event);
    * `timer` = armed event-time timer ms (NoVal if none); `ring` =
    * oldest-first closed-bucket sums, ≤ TrailN entries. */
  case class TsCtrl(next: Long, timer: Long, ring: Array[Long])

  /** `events`: (user_id, ts, event_type, value) streaming or batch frame —
    * the driver events shape. `delay` is the out-of-orderness bound. */
  def anomaly(events: DataFrame, delay: String = "30 minutes"): Dataset[TsFlag] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("event_ts"),
        floor($"value" * 100).cast("long").as("vc"))
      .withWatermark("event_ts", delay)
      .as[TsPoint]
      .groupByKey(_.user_id)
      .transformWithState(new TsAnomalyProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Per-user processor. State: "open" MapState bucketIdx→cents (buckets the
  * watermark hasn't sealed), "ctrl" ValueState [[TimeSeriesStream.TsCtrl]].
  */
final class TsAnomalyProcessor
  extends StatefulProcessor[Long, TimeSeriesStream.TsPoint, TimeSeriesStream.TsFlag] {
  import TimeSeriesStream._

  private val NoVal = Long.MinValue

  @transient private var open: MapState[java.lang.Long, Long] = _
  @transient private var ctrl: ValueState[TsCtrl] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getMapState[java.lang.Long, Long]("open",
      Encoders.LONG, Encoders.scalaLong, TTLConfig.NONE)
    ctrl = getHandle.getValueState[TsCtrl]("ctrl",
      Encoders.product[TsCtrl], TTLConfig.NONE)
  }

  private def readCtrl(): TsCtrl =
    if (ctrl.exists()) ctrl.get() else TsCtrl(NoVal, NoVal, Array.emptyLongArray)

  /** Seal every bucket the watermark has passed, up to the last observed
    * one; emit flags; re-arm the timer iff open buckets remain. */
  private def drain(key: Long, wm: Long, c0: TsCtrl): Iterator[TsFlag] = {
    var ring = c0.ring
    var maxOpen = NoVal
    var minOpen = java.lang.Long.MAX_VALUE
    val it = open.keys()
    while (it.hasNext) {
      val k = it.next().longValue()
      if (k > maxOpen) maxOpen = k
      if (k < minOpen) minOpen = k
    }
    // The span start is the MIN observed bucket (the batch `min(b)` span
    // semantics). It pins only at the FIRST seal (ring empty ⟺ nothing
    // sealed yet): until then, out-of-order arrivals above the watermark
    // may still extend the grid downward.
    var next = if (ring.isEmpty) minOpen else c0.next
    if (maxOpen == NoVal && ring.isEmpty) {
      ctrl.update(TsCtrl(NoVal, c0.timer, ring)); return Iterator.empty
    }
    val out = Vector.newBuilder[TsFlag]
    while (maxOpen != NoVal && next <= maxOpen && (next + 1) * BucketMs <= wm) {
      val boxed = java.lang.Long.valueOf(next)
      val cents = if (open.containsKey(boxed)) open.getValue(boxed) else 0L
      if (open.containsKey(boxed)) open.removeKey(boxed)
      if (ring.length == TimeSeries.TrailN && cents > 0 &&
          cents * TimeSeries.TrailN > TimeSeries.SpikeMult * ring.sum)
        out += TsFlag(key, next * BucketMs, cents, ring.sum)
      ring = (if (ring.length == TimeSeries.TrailN) ring.tail else ring) :+ cents
      next += 1
    }
    // timer: the earliest instant the next sealable bucket can close —
    // only while data is actually open (idle keys park with no timer)
    val newTimer =
      if (maxOpen != NoVal && next <= maxOpen) (next + 1) * BucketMs else NoVal
    if (newTimer != c0.timer) {
      if (c0.timer != NoVal) getHandle.deleteTimer(c0.timer)
      if (newTimer != NoVal) getHandle.registerTimer(newTimer)
    }
    ctrl.update(TsCtrl(next, newTimer, ring))
    out.result().iterator
  }

  override def handleInputRows(key: Long, rows: Iterator[TsPoint],
      timerValues: TimerValues): Iterator[TsFlag] = {
    val c0 = readCtrl()
    rows.foreach { p =>
      val b = Math.floorDiv(p.event_ts.getTime, BucketMs)
      // once sealing started (ring non-empty), a bucket below `next` is a
      // sealed bucket = late row, dropped; before that the span floats
      if (c0.ring.isEmpty || b >= c0.next) {
        val boxed = java.lang.Long.valueOf(b)
        val cur = if (open.containsKey(boxed)) open.getValue(boxed) else 0L
        open.updateValue(boxed, cur + p.vc)
      }
    }
    drain(key, timerValues.getCurrentWatermarkInMs(), c0)
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TsFlag] = {
    val c0 = readCtrl()
    val c1 =
      if (c0.timer == expired.getExpiryTimeInMs()) c0.copy(timer = NoVal) else c0
    drain(key, timerValues.getCurrentWatermarkInMs(), c1)
  }
}
