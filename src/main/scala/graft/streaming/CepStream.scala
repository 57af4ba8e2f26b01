package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

import graft.pattern.{NFA, NfaRunner, Pattern}

/** Structured Streaming execution of a [[graft.pattern.Pattern]] — the
  * engine's equivalent of the reference's streaming CEP operator with
  * event-time timers (`FlinkCEPExample.scala:76`,
  * `FlinkCEPAbsenceOfEventExample.scala:78-106`,
  * `FlinkProcessFunctionExample.scala:44-87`).
  *
  * Implementation: `transformWithState` (Spark 4.x) in EventTime mode with a
  * per-key [[graft.streaming.CepProcessor]]:
  *   - out-of-order events buffer in `ListState` until the watermark passes
  *     them (the reference buffers in the CEP operator until watermark,
  *     SURVEY.md §2.2 item 8); rows later than the watermark are dropped by
  *     the framework, matching Flink's late-event drop;
  *   - events at or before the watermark are sorted and fed to the
  *     incremental [[NfaRunner]], whose state snapshots into `ValueState`
  *     between micro-batches;
  *   - `registerTimer` fires on watermark advance for (a) buffered events
  *     that became ready and (b) `within` deadlines, so ABSENCE timeouts
  *     emit even when a key receives no further events — real per-key
  *     event-time timers, like Flink's, not the single-timeout
  *     `flatMapGroupsWithState` fallback (SURVEY.md §7.4 item 4);
  *   - matches and timeouts emit into ONE output stream as a tagged ADT
  *     (no side outputs in Spark — split downstream by `kind`).
  *
  * Scale: state per key = live partials (bounded by the `within` horizon) +
  * events buffered within the watermark delay. Use the RocksDB state store
  * provider (see [[CepStream.rocksConf]]) for large keyspaces.
  */
object CepStream {

  /** Config pairs for the RocksDB state store provider (production path). */
  val rocksConf: Seq[(String, String)] = Seq(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Run `pattern` per key over a streaming Dataset. `tsFn` must return the
    * same event-time (epoch ms) that the watermark column carries.
    */
  def matchPattern[K, T, O](
      ds: Dataset[T],
      keyFn: T => K,
      tsFn: T => Long,
      pattern: Pattern[T],
      emitMatch: (K, NFA.PatternMatch[T]) => IterableOnce[O],
      emitTimeout: (K, NFA.PatternTimeout[T]) => IterableOnce[O])(
      implicit ke: Encoder[K], te: Encoder[T], oe: Encoder[O],
      ct: scala.reflect.ClassTag[T]): Dataset[O] =
    matchPatternNumbered(ds, keyFn, tsFn, pattern,
      (k: K, m: NFA.PatternMatch[T], _: Long) => emitMatch(k, m), emitTimeout)

  /** Like [[matchPattern]], but `emitMatch` also receives the 1-based
    * per-key LIFETIME match number (SQL `MATCH_NUMBER()`), maintained in a
    * per-key `ValueState` counter that survives across micro-batches —
    * numbering matches what a batch run over the same ordered input yields.
    */
  def matchPatternNumbered[K, T, O](
      ds: Dataset[T],
      keyFn: T => K,
      tsFn: T => Long,
      pattern: Pattern[T],
      emitMatch: (K, NFA.PatternMatch[T], Long) => IterableOnce[O],
      emitTimeout: (K, NFA.PatternTimeout[T]) => IterableOnce[O])(
      implicit ke: Encoder[K], te: Encoder[T], oe: Encoder[O],
      ct: scala.reflect.ClassTag[T]): Dataset[O] =
    ds.groupByKey(keyFn)
      .transformWithState(
        new CepProcessor[K, T, O](pattern, tsFn, emitMatch, emitTimeout),
        TimeMode.EventTime(),
        OutputMode.Append())
}

/** Per-key stateful CEP processor. State:
  *  - "buf": events newer than the watermark, unordered (ListState);
  *  - "ctrl": ONE packed ValueState blob `[timer: i64][minBuf: i64][nfa
  *    snapshot bytes]` — the armed-timer expiry, the earliest buffered
  *    event time, and the [[NFA.Snapshot]] via [[SnapshotCodec]]. Packing
  *    the three into a single value halves the per-key state-store
  *    round-trips (RocksDB get/put are the dominant cost when every key
  *    appears in every micro-batch): the idle path is 1 get + 1 put, the
  *    drain path 1 get + 1 put plus the buf list ops. The NFA bytes are
  *    decoded lazily — a key with no watermark-ready work reads `minBuf`
  *    from the fixed header and never touches the snapshot;
  *  - "matchSeq": per-key lifetime match counter (MATCH_NUMBER), touched
  *    only when a match emits.
  */
final class CepProcessor[K, T, O](
    pattern: Pattern[T],
    tsFn: T => Long,
    emitMatch: (K, NFA.PatternMatch[T], Long) => IterableOnce[O],
    emitTimeout: (K, NFA.PatternTimeout[T]) => IterableOnce[O])(
    implicit te: Encoder[T], ct: scala.reflect.ClassTag[T])
  extends StatefulProcessor[K, T, O] {

  @transient private var buf: ListState[T] = _
  @transient private var ctrl: ValueState[Array[Byte]] = _
  @transient private var matchSeq: ValueState[Long] = _

  // Compact snapshot codec (events through the dataset's own Encoder, deduped
  // by NFA index) — replaces r1's Java serialization, whose reflective graph
  // walk dominated the per-key state round-trip cost.
  private val codec = new SnapshotCodec[T](te)

  private val NoVal = Long.MinValue
  private val Empty = Array.emptyByteArray

  /** Unpacked "ctrl" blob. `timer`/`minBuf` = [[NoVal]] when absent. */
  private final case class Ctrl(timer: Long, minBuf: Long, nfa: Array[Byte])

  private def readCtrl(): Ctrl =
    if (!ctrl.exists()) Ctrl(NoVal, NoVal, Empty)
    else {
      val bb = java.nio.ByteBuffer.wrap(ctrl.get())
      val timer = bb.getLong
      val minBuf = bb.getLong
      val nfa = if (bb.remaining() == 0) Empty else {
        val r = new Array[Byte](bb.remaining()); bb.get(r); r
      }
      Ctrl(timer, minBuf, nfa)
    }

  private def writeCtrl(c: Ctrl): Unit =
    if (c.timer == NoVal && c.minBuf == NoVal && c.nfa.isEmpty) ctrl.clear()
    else {
      val bb = java.nio.ByteBuffer.allocate(16 + c.nfa.length)
      bb.putLong(c.timer).putLong(c.minBuf).put(c.nfa)
      ctrl.update(bb.array())
    }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[T]("buf", te, TTLConfig.NONE)
    ctrl = getHandle.getValueState[Array[Byte]]("ctrl", Encoders.BINARY, TTLConfig.NONE)
    matchSeq = getHandle.getValueState[Long]("matchSeq", Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Feed all buffered events at or before the watermark to the NFA (sorted),
    * advance the watermark, re-buffer the rest, re-arm the timer, and write
    * the packed state back in one put.
    */
  private def drain(key: K, watermarkMs: Long, c0: Ctrl): Iterator[O] = {
    val all = buf.get().toVector
    val (ready, later) = all.partition(e => tsFn(e) <= watermarkMs)
    val runner = new NfaRunner[T](pattern, tsFn)
    if (c0.nfa.nonEmpty) runner.restore(codec.decode(c0.nfa))
    val out = Vector.newBuilder[O]

    // Per-key lifetime match counter (MATCH_NUMBER): loaded lazily so keys
    // emitting no match this drain skip the extra state round-trip.
    var seq = -1L
    def numbered(m: NFA.PatternMatch[T]): Unit = {
      if (seq < 0) seq = if (matchSeq.exists()) matchSeq.get() else 0L
      seq += 1
      out ++= emitMatch(key, m, seq)
    }
    ready.sortBy(tsFn).foreach { e =>
      val (ms, tos) = runner.onEvent(e)
      tos.foreach(t => out ++= emitTimeout(key, t))
      ms.foreach(numbered)
    }
    val (wmMatches, wmTimeouts) = runner.onWatermark(watermarkMs)
    wmMatches.foreach(numbered)
    wmTimeouts.foreach(t => out ++= emitTimeout(key, t))
    if (seq >= 0) matchSeq.update(seq)

    buf.clear()
    if (later.nonEmpty) buf.appendList(later.toArray)
    // keep the snapshot while buffered events remain even with no live
    // partials: the runner's event-index counter must stay continuous
    val nfaBytes =
      if (runner.hasLiveState || later.nonEmpty) codec.encode(runner.snapshot())
      else Empty

    // One armed timer per key: the earliest instant anything can happen next.
    val nextAt = (later.map(tsFn) ++ runner.earliestDeadline).minOption
    val newTimer = nextAt.getOrElse(NoVal)
    if (newTimer != c0.timer) {
      if (c0.timer != NoVal) getHandle.deleteTimer(c0.timer)
      if (newTimer != NoVal) getHandle.registerTimer(newTimer)
    }
    writeCtrl(Ctrl(newTimer,
      if (later.nonEmpty) later.map(tsFn).min else NoVal, nfaBytes))
    out.result().iterator
  }

  override def handleInputRows(
      key: K, rows: Iterator[T], timerValues: TimerValues): Iterator[O] = {
    val c0 = readCtrl()
    val arr = rows.toArray
    if (arr.isEmpty) return drain(key, timerValues.getCurrentWatermarkInMs(), c0)
    buf.appendList(arr)
    val newMin = arr.iterator.map(tsFn).min
    val curMin = if (c0.minBuf != NoVal) math.min(c0.minBuf, newMin) else newMin
    val wm = timerValues.getCurrentWatermarkInMs()
    if (curMin <= wm) drain(key, wm, c0)
    else {
      // Nothing is ready: skip the NFA decode entirely (the header read is
      // enough) and only make sure the timer covers the newly buffered
      // events. An already-armed earlier timer still reflects the earliest
      // NFA deadline.
      val newTimer =
        if (c0.timer != NoVal && c0.timer <= curMin) c0.timer
        else {
          if (c0.timer != NoVal) getHandle.deleteTimer(c0.timer)
          getHandle.registerTimer(curMin)
          curMin
        }
      writeCtrl(Ctrl(newTimer, curMin, c0.nfa))
      Iterator.empty
    }
  }

  override def handleExpiredTimer(
      key: K, timerValues: TimerValues, expired: ExpiredTimerInfo): Iterator[O] = {
    val c0 = readCtrl()
    val c1 =
      if (c0.timer == expired.getExpiryTimeInMs()) c0.copy(timer = NoVal) else c0
    drain(key, timerValues.getCurrentWatermarkInMs(), c1)
  }
}
