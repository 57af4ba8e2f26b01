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
  *  - "buf": events newer than the watermark, unordered;
  *  - "nfa": [[NFA.Snapshot]] of the runner, via [[SnapshotCodec]];
  *  - "timer": the single currently-registered timer expiry (re-armed to
  *    min(next buffered ts, earliest within-deadline) after every change);
  *  - "minBuf": earliest buffered event time — the cheap gate that lets a
  *    key with no watermark-ready work skip the NFA snapshot round-trip
  *    (the dominant per-key cost when every key appears in every batch).
  */
final class CepProcessor[K, T, O](
    pattern: Pattern[T],
    tsFn: T => Long,
    emitMatch: (K, NFA.PatternMatch[T], Long) => IterableOnce[O],
    emitTimeout: (K, NFA.PatternTimeout[T]) => IterableOnce[O])(
    implicit te: Encoder[T], ct: scala.reflect.ClassTag[T])
  extends StatefulProcessor[K, T, O] {

  @transient private var buf: ListState[T] = _
  @transient private var nfa: ValueState[Array[Byte]] = _
  @transient private var timer: ValueState[Long] = _
  @transient private var minBuf: ValueState[Long] = _
  @transient private var matchSeq: ValueState[Long] = _

  // Compact snapshot codec (events through the dataset's own Encoder, deduped
  // by NFA index) — replaces r1's Java serialization, whose reflective graph
  // walk dominated the per-key state round-trip cost.
  private val codec = new SnapshotCodec[T](te)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[T]("buf", te, TTLConfig.NONE)
    nfa = getHandle.getValueState[Array[Byte]]("nfa", Encoders.BINARY, TTLConfig.NONE)
    timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
    minBuf = getHandle.getValueState[Long]("minBuf", Encoders.scalaLong, TTLConfig.NONE)
    matchSeq = getHandle.getValueState[Long]("matchSeq", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def loadRunner(): NfaRunner[T] = {
    val r = new NfaRunner[T](pattern, tsFn)
    if (nfa.exists()) r.restore(codec.decode(nfa.get()))
    r
  }

  private def saveRunner(r: NfaRunner[T]): Unit =
    nfa.update(codec.encode(r.snapshot()))

  /** Feed all buffered events at or before the watermark to the NFA (sorted),
    * advance the watermark, re-buffer the rest, and re-arm the timer.
    */
  private def drain(key: K, watermarkMs: Long): Iterator[O] = {
    val all = buf.get().toVector
    val (ready, later) = all.partition(e => tsFn(e) <= watermarkMs)
    val runner = loadRunner()
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
    if (runner.hasLiveState || later.nonEmpty) saveRunner(runner)
    else nfa.clear()

    if (later.nonEmpty) minBuf.update(later.map(tsFn).min) else minBuf.clear()

    // One armed timer per key: the earliest instant anything can happen next.
    val nextAt = (later.map(tsFn) ++ runner.earliestDeadline).minOption
    arm(nextAt)
    out.result().iterator
  }

  private def arm(nextAt: Option[Long]): Unit = {
    val prev = if (timer.exists()) Some(timer.get()) else None
    if (nextAt != prev) {
      prev.foreach(getHandle.deleteTimer)
      nextAt.foreach { at =>
        getHandle.registerTimer(at)
        timer.update(at)
      }
      if (nextAt.isEmpty) timer.clear()
    }
  }

  override def handleInputRows(
      key: K, rows: Iterator[T], timerValues: TimerValues): Iterator[O] = {
    val arr = rows.toArray
    if (arr.isEmpty) return drain(key, timerValues.getCurrentWatermarkInMs())
    buf.appendList(arr)
    val newMin = arr.iterator.map(tsFn).min
    val curMin = if (minBuf.exists()) math.min(minBuf.get(), newMin) else newMin
    minBuf.update(curMin)
    val wm = timerValues.getCurrentWatermarkInMs()
    if (curMin <= wm) drain(key, wm)
    else {
      // Nothing is ready: skip the NFA state round-trip entirely (the
      // dominant per-key cost when every key appears in every micro-batch)
      // and only make sure the timer covers the newly buffered events. The
      // previously armed timer already reflects the earliest NFA deadline.
      val prev = if (timer.exists()) Some(timer.get()) else None
      if (!prev.exists(_ <= curMin)) arm(Some(curMin))
      Iterator.empty
    }
  }

  override def handleExpiredTimer(
      key: K, timerValues: TimerValues, expired: ExpiredTimerInfo): Iterator[O] = {
    if (timer.exists() && timer.get() == expired.getExpiryTimeInMs()) timer.clear()
    drain(key, timerValues.getCurrentWatermarkInMs())
  }
}
