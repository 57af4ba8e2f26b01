package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.EntityResolution

/** Streaming INCREMENTAL ENTITY ASSIGNMENT — the live-ingest half of the
  * master-data contract [[EntityResolution.assign]] documents: arrivals
  * resolve against a STATIC master snapshot per micro-batch via
  * `foreachBatch`, running the exact batch plan (block keys → hot-block
  * guard → block equi-join → integer scoring → combinable per-record
  * argmax). The batch operator is RECORD-LOCAL given the master — no
  * cross-arrival state — which is precisely what makes the per-batch
  * replay sound: any slicing of the arrival stream yields the same
  * per-record verdicts as one batch run over the union
  * (`EntityAssignStreamSpec` pins it). Stateless between batches, so no
  * state store, no watermark, and a master REFRESH is just restarting the
  * query against the new snapshot (the frozen-IVF `ivfAssignerOf` refresh
  * convention).
  *
  * Shape at scale: per micro-batch, the master side is a static relation
  * Spark re-plans each trigger — the block-key join stays an AQE-sized
  * equi-join and the arrivals never shuffle more than once. */
object EntityAssignStream {

  /** Start the per-batch assignment of streaming `incoming` (registry
    * schema: rec_id, name, nation, bal, seg) against the static `master`;
    * each micro-batch's `(rec_id, entity_id, score, status)` verdicts are
    * handed to `sink`. */
  def start(
      incoming: DataFrame, master: DataFrame, maxBlock: Int)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(EntityResolution.assignOf(batch, master, maxBlock), id)
      }
      .outputMode("update")
      .start()
}
