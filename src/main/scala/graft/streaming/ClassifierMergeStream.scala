package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.TextAnalysis

/** Streaming INCREMENTAL CLASSIFIER REFRESH — the live-ingest half of the
  * `q_classifier_merge` contract (the [[DedupAssignStream]] /
  * [[EntityAssignStream]] twin pattern, applied to the MODEL instead of
  * the index): labeled arrival batches fold into a running per-bucket
  * count table via `foreachBatch`, each fold the exact batch-plan merge
  * ([[TextAnalysis.mergeClfCounts]] — per-bucket addition, cost ∝ |batch|
  * + ClfBuckets, never the corpus), and the current weights freeze from
  * the running counts on demand ([[ClfModelState.weights]] — what a
  * scoring query or a downstream [[TextAnalysis.fittedScorerOf]] consumer
  * reads between batches).
  *
  * Because the fit's sufficient statistics are plain sums, the running
  * model after ANY micro-batch slicing equals one fit over the union of
  * everything folded so far — slicing-invariance is pinned in
  * `ClassifierMergeStreamSpec` against [[TextAnalysis.classifierFitOf]]
  * on the union. The per-fold [[graft.Caches.materialize]] keeps every
  * batch's plan constant-size over a checkpointed leaf (the
  * `Components.materialize` round-loop discipline — without it batch N's
  * count plan would nest N−1 prior merges). State is ≤ ClfBuckets rows
  * regardless of stream length — bounded by the FEATURE SPACE, not the
  * data, the strongest bounded-state story an online trainer can have. */
object ClassifierMergeStream {

  /** The running count table — seed with a snapshot's counts (the `clfw`
    * artifact's `(bucket, n_pos, n_neg)` columns) or an empty frame for a
    * from-scratch online fit. Thread-safe: `foreachBatch` folds are
    * serialized per query, reads may come from any thread. */
  final class ClfModelState(initial: DataFrame) {
    @volatile private var cur: DataFrame = graft.Caches.materialize(initial)

    /** The current `(bucket, n_pos, n_neg)` table. */
    def counts: DataFrame = cur

    /** Weights frozen from the CURRENT counts — prior re-derived, so this
      * is exactly the fit over everything folded so far. */
    def weights: Seq[Long] =
      TextAnalysis.fitWeightArrayOf(TextAnalysis.weightsOfCounts(cur))

    private[streaming] def fold(batch: DataFrame): DataFrame =
      synchronized {
        cur = graft.Caches.materialize(
          TextAnalysis.mergeClfCounts(cur, TextAnalysis.clfCountsOf(batch)))
        cur
      }
  }

  /** Start folding the labeled stream `incoming` (`(lang, text)` rows at
    * minimum) into `state`; after each micro-batch the UPDATED count
    * table is handed to `sink` (e.g. to republish a serving artifact). */
  def start(incoming: DataFrame, state: ClfModelState)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(state.fold(batch), id)
      }
      .outputMode("update")
      .start()
}
