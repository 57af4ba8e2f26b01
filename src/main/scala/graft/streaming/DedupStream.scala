package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EXACT dedup — the ingest-time twin of the batch
  * `q_dedup_exact` digest grouping (`graft.pipeline.Dedup.exact`), built on
  * `dropDuplicatesWithinWatermark`: the first-arriving document per text
  * digest survives, later copies are dropped for as long as the digest's
  * state lives.
  *
  * State contract at scale (the reason this is `WithinWatermark` and not
  * plain `dropDuplicates`): per-digest state is EVICTED once the event-time
  * watermark passes the digest's last-seen timestamp + the delay horizon —
  * bounded state on an unbounded stream, the same horizon×rate bound as the
  * CEP buffers (SURVEY §7.4.7). The documented trade: a copy arriving after
  * its original's state expired is admitted again; dedup is exact WITHIN the
  * horizon, which is the Flink/production semantics for keyed TTL state.
  * Downstream, the batch digest-groupBy remains the periodic full-corpus
  * sweep; this operator keeps the gap between sweeps clean.
  */
object DedupStream {

  /** `docs`: (doc_id, text, ts) streaming or batch frame; emits the
    * surviving rows with their digest. */
  def dedup(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("digest")
}
