package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.pipeline.{Curation, Dedup}
import graft.pipeline.Hashing._

/** Streaming near-dup curation — the continuous-ingest counterpart of
  * [[graft.pipeline.Curation.curateNear]]. Batch near-dup curation is a
  * transitive closure (LSH pairs → connected components → keep the cluster
  * minimum); a stream cannot wait for the closure, so the online contract is
  * KEEP-FIRST: a document survives iff no EARLIER-ARRIVING document is a
  * near-duplicate of it (same banded-LSH candidate rule and ≥ 4/8 signature
  * agreement as the batch operator — the SAME native `ShingleMd5` /
  * `RotMinHash` expressions compute the signatures in the stream plan).
  * Dropped documents still enter the signature store: near-dup chains
  * propagate through dropped docs exactly like edges through non-canonical
  * nodes in the batch pair graph. When arrival order equals doc_id order,
  * keep-first equals the batch rule "no LSH pair (a, d) with a < d" — the
  * equivalence `NearDupStreamSpec` pins over MemoryStream micro-batches.
  *
  * Scale shape: ONE stateful operator, hash-partitioned by the caller's
  * shard key (`key` — e.g. source or crawl segment; near-dups across shards
  * are not caught, the standard sharded-dedup tradeoff). Per shard the
  * state is a MapState band-bucket → stored signatures, RocksDB-backed:
  *
  *  - lookup + insert touch exactly [[Dedup.Bands]] buckets per doc — no
  *    scan of the corpus, no stream-stream join;
  *  - a bucket stores at most [[Dedup.MaxBucket]] entries (the streaming
  *    spelling of the batch hot-bucket guard: a degenerate boilerplate
  *    bucket stops absorbing state instead of growing O(corpus));
  *  - STATE-SIZE CONTRACT: entries expire after `ttl` (processing-time TTL
  *    on the state store — the streaming analog of a dedup horizon; a doc
  *    arriving after its duplicate's signature expired is kept, exactly
  *    like `dropDuplicatesWithinWatermark` re-admits a key past the
  *    watermark). `TTLConfig.NONE` keeps signatures forever — bounded
  *    corpora / tests only.
  */
object NearDupStream {

  /** Stream-side input after signature computation. */
  case class DocSig(key: String, doc_id: Long, sig: Seq[String])
  /** Output annotation: `dup_of` = earliest near-duplicate predecessor's
    * doc_id, or -1 when the doc is kept. */
  case class Annotated(key: String, doc_id: Long, dup_of: Long)
  /** One band bucket's stored entries. */
  case class Bucket(docs: Seq[BucketDoc])
  case class BucketDoc(doc_id: Long, sig: Seq[String])

  /** Annotate a `(key, doc_id, text)` stream with keep-first near-dup
    * verdicts. DataFrame→Dataset so the spec can drive it from MemoryStream
    * and the library user from readStream. */
  def annotate(docs: DataFrame, ttl: TTLConfig = TTLConfig.NONE): Dataset[Annotated] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"key", $"doc_id",
        minhashSigRot(shingleMd5(tokens($"text")), Dedup.MinhashK).as("sig"))
      .as[DocSig]
      .groupByKey(_.key)
      .transformWithState(new NearDupProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }

  /** The full streaming curation composition: keep-first near-dedup →
    * the SAME deterministic salted sample as batch [[Curation.curateNear]]
    * (identical hash, salt, and keep-rate — a doc kept by both paths is
    * sampled identically). */
  def curateNear(docs: DataFrame, ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    annotate(docs, ttl).toDF()
      .filter($"dup_of" < 0)
      .filter(
        charFoldHash(concat(lit("near:"), $"doc_id".cast("string"))) % 100
          < Curation.CuratePct)
      .select($"key", $"doc_id")
  }
}

/** Per-shard keep-first near-dup state: band bucket → stored signatures. */
final class NearDupProcessor(ttl: TTLConfig)
  extends StatefulProcessor[String, NearDupStream.DocSig, NearDupStream.Annotated] {
  import NearDupStream._

  @transient private var buckets: MapState[String, Bucket] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buckets = getHandle.getMapState[String, Bucket](
      "buckets", Encoders.STRING, Encoders.product[Bucket], ttl)

  private def bandKeys(sig: Seq[String]): Seq[String] =
    (0 until Dedup.Bands).map(b => b + ":" + sig(2 * b) + sig(2 * b + 1))

  private def agreement(a: Seq[String], b: Seq[String]): Int =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }

  override def handleInputRows(
      key: String,
      rows: Iterator[DocSig],
      timerValues: TimerValues): Iterator[Annotated] = {
    // doc_id order within the micro-batch: replaying the same batches
    // reproduces the same verdicts (same convention as PackProcessor)
    rows.toArray.sortBy(_.doc_id).iterator.map { d =>
      // a sub-3-token doc has no shingles and a null/empty signature: it can
      // never collide (mirrors the batch bucket-join, where its band key is
      // null and joins nothing) — keep it, store nothing
      if (d.sig == null || d.sig.isEmpty) Annotated(d.key, d.doc_id, -1L)
      else {
        val keys = bandKeys(d.sig)
        val dupOf = keys.iterator
          .flatMap(k => if (buckets.containsKey(k)) buckets.getValue(k).docs else Nil)
          .filter(c => agreement(c.sig, d.sig) >= 4)
          .map(_.doc_id)
          .foldLeft(-1L)((m, id) => if (m < 0 || id < m) id else m)
        keys.foreach { k =>
          val cur = if (buckets.containsKey(k)) buckets.getValue(k).docs else Seq.empty
          if (cur.size < Dedup.MaxBucket)
            buckets.updateValue(k, Bucket(cur :+ BucketDoc(d.doc_id, d.sig)))
        }
        Annotated(d.key, d.doc_id, dupOf)
      }
    }
  }
}
