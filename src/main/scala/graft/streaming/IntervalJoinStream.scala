package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join between two keyed streams — the Flink
  * `KeyedStream.intervalJoin(...).between(lowerBound, upperBound)` DataStream
  * operator (the relational sibling of the CEP `within` pairing the reference
  * builds by NFA, FlinkCEPExample.scala:58) expressed as Structured
  * Streaming's watermarked stream-stream equi-join with a time-range
  * residual: per user, (error, purchase) pairs with the purchase inside
  * [error_ts, error_ts + 1 hour] — the SAME contract as the batch
  * `q_join_range` (`graft.relational.Joins.range`), which
  * `IntervalJoinStreamSpec` pins streaming ≡ batch.
  *
  * State contract at scale: both inputs carry a watermark and the join
  * condition bounds each side's event time relative to the other, so Spark
  * derives state-eviction thresholds — a buffered left row is dropped once
  * the right watermark passes `err_ts + 1 hour`, a right row once the left
  * watermark passes `pur_ts` (no unbounded join state, the stream-stream
  * admission requirement). Parallelism is the join-key hash partitioning,
  * the same keyed scope as Flink's.
  */
object IntervalJoinStream {

  /** `errors`: (err_id, user_id, err_ts); `purchases`: (pur_id, u2, pur_ts).
    * Works on streaming AND batch frames — on batch, Catalyst's
    * EliminateEventTimeWatermark drops the watermark nodes and the same
    * join runs as a plain range join (how the parity spec builds its
    * oracle). `delay` is the out-of-orderness bound. */
  def join(errors: DataFrame, purchases: DataFrame,
      delay: String = "30 minutes"): DataFrame = {
    val l = errors.withWatermark("err_ts", delay)
    val r = purchases.withWatermark("pur_ts", delay)
    l.join(r, expr(
        "user_id = u2 AND pur_ts >= err_ts AND pur_ts <= err_ts + INTERVAL 1 HOUR"))
      .select(col("err_id"), col("pur_id"))
  }
}
