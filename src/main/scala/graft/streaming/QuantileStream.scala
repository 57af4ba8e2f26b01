package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming per-key QUANTILE monitor over a bounded power-of-two
  * histogram — the live twin of the batch length-distribution queries
  * (`q_text_length_stats` exact ranks / `_approx` t-digest): a stream
  * cannot rank, so it keeps a 64-bucket log₂ histogram per key (bucket
  * b = floor(log₂ v) holds values in [2^b, 2^(b+1))) and answers
  * quantiles as the bucket containing rank ⌈p·n⌉ — the same discrete
  * lower-rank convention `lengthStats` uses, applied to buckets.
  *
  * Contracts (`QuantileStreamSpec`):
  *  - the histogram is EXACT (bucketing loses resolution, never counts),
  *    so streaming ≡ a batch fold of the same bucketing, any slicing;
  *  - bracketing: the exact batch p50/p90 value always lies inside the
  *    reported [2^b, 2^(b+1)) bucket range.
  *
  * State per key: 64 longs + a count — constant in stream length (the
  * whole point: a billion-doc source still holds one cache line of
  * counters). Values must be ≥ 1 (document lengths are). At 100 TB this
  * is the standard live ingest-distribution dashboard feed: per-source
  * histogram state, O(1) update, mergeable across restarts via the
  * checkpointed state store. */
object QuantileStream {

  val Buckets = 64

  case class QIn(key: String, v: Long)
  /** Quantile answers as bucket LOWER bounds (2^b) plus the count — the
    * upper bound is always 2·lo, so one number carries the range. */
  case class QOut(key: String, n: Long, p50_lo: Long, p90_lo: Long, max_lo: Long)
  case class QState(n: Long, counts: Seq[Long])

  def quantiles(in: Dataset[QIn]): Dataset[QOut] = {
    val s = in.sparkSession
    import s.implicits._
    in.groupByKey(_.key)
      .transformWithState(new QuantileProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** floor(log₂ v) for v ≥ 1 — exact integer, no float log. */
  def bucketOf(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))

  /** Lower bound of the bucket holding rank ⌈p_num/p_den · n⌉ (the
    * lengthStats discrete convention: rank (p_num·n + p_num) div p_den
    * for p90 → here the simpler ⌈·⌉ = (p_num·n + p_den − 1) div p_den). */
  def rankBucketLo(counts: Seq[Long], n: Long, pNum: Long, pDen: Long): Long = {
    val target = (pNum * n + pDen - 1) / pDen
    var acc = 0L
    var b = 0
    while (b < counts.length) {
      acc += counts(b)
      if (acc >= target) return 1L << b
      b += 1
    }
    0L
  }
}

/** Per-key bounded-histogram state machine. */
final class QuantileProcessor
  extends StatefulProcessor[String, QuantileStream.QIn, QuantileStream.QOut] {
  import QuantileStream._

  @transient private var st: ValueState[QState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[QState]("hist",
      Encoders.product[QState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[QIn],
      timerValues: TimerValues): Iterator[QOut] = {
    val c0 = if (st.exists()) st.get() else QState(0L, Vector.fill(Buckets)(0L))
    var n = c0.n
    val counts = c0.counts.toArray
    rows.foreach { r => counts(bucketOf(r.v)) += 1; n += 1 }
    st.update(QState(n, counts.toVector))
    val top = counts.lastIndexWhere(_ > 0)
    Iterator.single(QOut(key, n,
      rankBucketLo(counts, n, 1L, 2L),
      rankBucketLo(counts, n, 9L, 10L),
      if (top < 0) 0L else 1L << top))
  }
}
