package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** DYNAMIC-RULE streaming operator — the broadcast-state idiom (Flink's
  * `BroadcastProcessFunction`) the reference's deployments would need to
  * change a CEP threshold WITHOUT a job restart: the reference hard-codes
  * its low-balance condition (`FlinkCEPExample.scala:59-63`,
  * `balanceBefore >= 10 && balanceAfter < 10` — the constant 10 is
  * compile-time), and so did every pattern predicate in this engine until
  * now.
  *
  * Spark shape: ONE tagged-union input stream (`kind = "rule" | "data"`)
  * into `transformWithState` — rule rows update a per-key rule register
  * (`ValueState`); data rows evaluate against the register's latest value.
  * A rule takes effect from its EVENT TIME: rows buffer until the
  * watermark passes them and fold in (ts, rule-before-data) order, so the
  * rule/data interleaving is deterministic — the output is a pure
  * function of the input rows, independent of micro-batch slicing
  * (pinned in `DynamicRuleStreamSpec`), and a batch replay of the same
  * tagged rows ([[detectBatch]]) produces identical alerts. The register
  * lives in the state store, so a checkpoint restart CARRIES the rules —
  * the no-restart contract.
  *
  * Key routing: Flink's broadcast state delivers one control message to
  * every parallel instance; Spark state is keyed, so a rule addresses the
  * KEY it governs. Per-key rules are the general form (per-account
  * thresholds); a genuinely global rule is delivered by exploding it to
  * the governed keys upstream (a narrow map over the control stream —
  * control traffic is tiny by definition), or by per-epoch re-broadcast:
  * join each micro-batch against a broadcast rules table in
  * `foreachBatch`, re-read per epoch (the stateless alternative when
  * rules live in an external store).
  *
  * Scale: state per key = one long (the register) + rows buffered within
  * the watermark delay — bounded, RocksDB-backed like every stateful
  * operator here ([[CepStream.rocksConf]]).
  */
object DynamicRuleStream {

  /** The reference's compile-time threshold (`FlinkCEPExample.scala:61`) —
    * the rule register's initial value until the first rule row folds in. */
  val DefaultThreshold = 10L

  /** Tagged-union row. `kind = "rule"`: `threshold` becomes the key's rule
    * from event time `ts` on (balances ignored). `kind = "data"`: a
    * balance reading to evaluate (threshold field ignored). */
  final case class RuleOrEvent(
      kind: String, key: String, ts: Timestamp,
      balanceBefore: Long, balanceAfter: Long, threshold: Long)

  /** A crossing alert: the reading dropped below the threshold IN EFFECT
    * at its event time; `threshold` records which rule fired. */
  final case class ThresholdAlert(
      key: String, ts: Timestamp,
      balanceBefore: Long, balanceAfter: Long, threshold: Long)

  /** Streaming detection: rules applied mid-stream without restart. */
  def detect(
      rows: Dataset[RuleOrEvent],
      watermarkDelay: String = "6 minutes"): Dataset[ThresholdAlert] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.withWatermark("ts", watermarkDelay)
      .as[RuleOrEvent]
      .groupByKey(_.key)
      .transformWithState(
        new DynamicRuleProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch twin over the SAME tagged rows: the threshold in effect at any
    * event time is the last rule at or before it (rules sort before data
    * at equal ts — same tie rule as the streaming fold; at most one rule
    * per (key, ts) by contract). One window pass, no state. */
  def detectBatch(rows: Dataset[RuleOrEvent]): Dataset[ThresholdAlert] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"key")
      .orderBy($"ts", when($"kind" === "rule", 0).otherwise(1))
    rows.toDF()
      .withColumn("thr", coalesce(
        last(when($"kind" === "rule", $"threshold"), ignoreNulls = true).over(w),
        lit(DefaultThreshold)))
      .filter($"kind" === "data" &&
        $"balanceBefore" >= $"thr" && $"balanceAfter" < $"thr")
      .select($"key", $"ts", $"balanceBefore", $"balanceAfter",
        $"thr".as("threshold"))
      .as[ThresholdAlert]
  }
}

/** Per-key processor: `thr` = the rule register (ValueState, initialized
  * lazily to [[DynamicRuleStream.DefaultThreshold]]), `buf` = rows newer
  * than the watermark (ListState), `armed` = the pending event-time timer
  * so buffered rows drain when the watermark advances even if the key
  * receives no further input. Watermark-ready rows fold in
  * (ts, rule-before-data) order — the determinism contract. */
final class DynamicRuleProcessor(
    implicit re: Encoder[DynamicRuleStream.RuleOrEvent])
  extends StatefulProcessor[
    String, DynamicRuleStream.RuleOrEvent, DynamicRuleStream.ThresholdAlert] {

  import DynamicRuleStream._

  @transient private var buf: ListState[RuleOrEvent] = _
  @transient private var thr: ValueState[Long] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[RuleOrEvent]("buf", re, TTLConfig.NONE)
    thr = getHandle.getValueState[Long]("thr", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def drain(
      key: String, wm: Long, newRows: Seq[RuleOrEvent]): Iterator[ThresholdAlert] = {
    val all = buf.get().toVector ++ newRows
    val (ready, later) = all.partition(_.ts.getTime <= wm)
    val out = Vector.newBuilder[ThresholdAlert]
    val cur0 = if (thr.exists()) thr.get() else DefaultThreshold
    var cur = cur0
    ready.sortBy(r => (r.ts.getTime, if (r.kind == "rule") 0 else 1))
      .foreach { r =>
        if (r.kind == "rule") cur = r.threshold
        else if (r.balanceBefore >= cur && r.balanceAfter < cur)
          out += ThresholdAlert(key, r.ts, r.balanceBefore, r.balanceAfter, cur)
      }
    if (cur != cur0 || !thr.exists()) thr.update(cur)
    buf.clear()
    if (later.nonEmpty) buf.appendList(later.toArray)
    // one armed timer per key, at the earliest buffered row
    val prev = if (armed.exists()) armed.get() else Long.MinValue
    val next =
      if (later.nonEmpty) later.iterator.map(_.ts.getTime).min else Long.MinValue
    if (next != prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev)
      if (next != Long.MinValue) { getHandle.registerTimer(next); armed.update(next) }
      else armed.clear()
    }
    out.result().iterator
  }

  override def handleInputRows(
      key: String, rows: Iterator[RuleOrEvent],
      timerValues: TimerValues): Iterator[ThresholdAlert] =
    drain(key, timerValues.getCurrentWatermarkInMs(), rows.toVector)

  override def handleExpiredTimer(
      key: String, timerValues: TimerValues,
      expired: ExpiredTimerInfo): Iterator[ThresholdAlert] = {
    if (armed.exists() && armed.get() == expired.getExpiryTimeInMs()) armed.clear()
    drain(key, timerValues.getCurrentWatermarkInMs(), Nil)
  }
}
