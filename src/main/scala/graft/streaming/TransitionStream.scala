package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.relational.Paths

/** Streaming event-type TRANSITIONS — the live feed of the batch
  * `q_path_transitions` matrix (`graft.relational.Paths.transitionsOf`):
  * per user, every consecutive event pair within the
  * [[Paths.TransitionGapMin]] session gap emits one (src, dst, gap_s)
  * row; the downstream matrix is a plain streaming aggregation over these
  * (or the batch rollup — `TransitionStreamSpec` pins the PAIR stream
  * against the batch matrix counts).
  *
  * State contract: ONE tiny ValueState per user (last event's ts, id,
  * type) — O(1) regardless of stream length, no timers, no buffering
  * (the [[CountWindowStream]] state shape). Ordering contract is also
  * CountWindowStream's: ACROSS micro-batches arrival order, WITHIN a
  * batch the deterministic (ts, event_id) order — when ingest is
  * event-time ordered (the normal case), the emitted pairs equal the
  * batch lag-window extraction exactly.
  */
object TransitionStream {

  case class PEvent(user_id: Long, ts_ms: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, src: String, dst: String, gap_s: Long)
  case class LastEv(ts_ms: Long, event_id: Long, typ: String)

  /** `events`: (user_id, ts, event_type, event_id) streaming or batch
    * frame — the driver events shape. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id",
        (unix_timestamp(date_trunc("second", $"ts")) * 1000L).as("ts_ms"),
        $"event_id", $"event_type")
      .as[PEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

final class TransitionProcessor
  extends StatefulProcessor[Long, TransitionStream.PEvent, TransitionStream.Transition] {
  import TransitionStream._

  @transient private var last: ValueState[LastEv] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastEv]("last",
      Encoders.product[LastEv], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[PEvent],
      timerValues: TimerValues): Iterator[Transition] = {
    var prev = if (last.exists()) last.get() else null
    val out = Vector.newBuilder[Transition]
    rows.toVector.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
      if (prev != null) {
        val gapS = (e.ts_ms - prev.ts_ms) / 1000L
        if (gapS <= Paths.TransitionGapMin * 60L)
          out += Transition(key, prev.typ, e.event_type, gapS)
      }
      prev = LastEv(e.ts_ms, e.event_id, e.event_type)
    }
    if (prev != null) last.update(prev)
    out.result().iterator
  }
}
