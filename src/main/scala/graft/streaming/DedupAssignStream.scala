package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Dedup

/** Streaming NEAR-DUP ADMISSION against a persisted corpus index — the
  * live-ingest half of the [[Dedup.minhashIndex]] contract (r10 verdict
  * #2, the [[EntityAssignStream]] shape): arrivals check against a STATIC
  * MinHash signature/band index per micro-batch via `foreachBatch`,
  * running the exact batch plan ([[Dedup.assignOf]] — band-key equi-join
  * against the index scan, ≥ 4/8 signature verify, per-arrival verdict).
  * ZERO corpus signature replay: the index is two parquet scans; before
  * r11 the streaming admission path ([[NearDupStream]]'s stateful
  * keep-first) was the only option when the corpus predates the stream,
  * and a batch replay re-hashed the whole corpus per run.
  *
  * [[Dedup.assignOf]] is RECORD-LOCAL given the index — no cross-arrival
  * state — so any slicing of the arrival stream yields the same
  * per-document verdicts as one batch run over the union
  * (`DedupAssignStreamSpec` pins it). Stateless between batches: no state
  * store, no watermark; an index REFRESH is restarting the query against
  * the new snapshot (the frozen-IVF refresh convention). Complementary to
  * [[NearDupStream]], which catches dups WITHIN the stream — production
  * ingest runs both: admission against yesterday's corpus, keep-first
  * among today's arrivals. */
object DedupAssignStream {

  /** Start the per-batch admission of streaming `incoming` (`(doc_id,
    * text)` rows) against the persisted index scans `ixSigs`/`ixBands`
    * ([[Dedup.minhashIndex]]); each micro-batch's `(doc_id, dup_of,
    * n_dups, verdict)` rows are handed to `sink`. */
  def start(
      incoming: DataFrame, ixSigs: DataFrame, ixBands: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Dedup.assignOf(batch, ixSigs, ixBands), id)
      }
      .outputMode("update")
      .start()
}
