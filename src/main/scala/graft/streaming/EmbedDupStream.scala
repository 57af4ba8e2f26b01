package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.pipeline.{Dedup, Similarity}
import graft.pipeline.Hashing._

/** Streaming EMBEDDING near-dup — the vector-space counterpart of
  * [[NearDupStream]] (which fingerprints text): a vector survives iff no
  * EARLIER-ARRIVING vector within cosine ≥ 0.4 shares its hyperplane-LSH
  * neighborhood. Same candidate rule as the batch operator
  * ([[Dedup.embedding]]): deterministic [[Similarity.bucket]] planes
  * ([[Dedup.EmbeddingPlanes]]), radius-1 multiprobe (the arriving vector
  * probes its own bucket plus every 1-bit flip — symmetric to the batch
  * probe-side explode), and the IDENTICAL exact integer cosine test
  * `25·dot² ≥ 4·|a|²·|b|²` over micro-quantized vectors — here in
  * `BigInt` (per-candidate JVM work; the batch plan's Decimal(38)
  * borderline arm is the same 128-bit arithmetic). When arrival order
  * equals vec_id order, keep-first equals the batch pair rule "no pair
  * (a, d) with a < d" — pinned in `EmbedDupStreamSpec`.
  *
  * Scale shape mirrors [[NearDupStream]]: one stateful operator hash-
  * partitioned by the caller's shard key; per shard a MapState
  * bucket-id → stored quantized vectors; lookup touches 1 + planes
  * buckets per arrival; a bucket stops absorbing at [[Dedup.MaxBucket]]
  * entries (hot-bucket guard); `ttl` bounds state age (the dedup
  * horizon).
  */
object EmbedDupStream {

  case class VecRow(key: String, vec_id: Long, q: Seq[Long], n2: Long, bkt: Long)
  /** `dup_of` = earliest near-duplicate predecessor, or -1 when kept. */
  case class Annotated(key: String, vec_id: Long, dup_of: Long)
  case class VBucket(vecs: Seq[VEntry])
  case class VEntry(vec_id: Long, q: Seq[Long], n2: Long)

  /** Annotate a `(key, vec_id, embedding)` stream with keep-first
    * near-dup verdicts; the signature/bucket computation runs in the
    * stream plan through the SAME native expressions as batch. */
  def annotate(vecs: DataFrame, ttl: TTLConfig = TTLConfig.NONE): Dataset[Annotated] = {
    val s = vecs.sparkSession
    import s.implicits._
    vecs
      .select($"key", $"vec_id", quantize($"embedding").as("q"))
      .withColumn("n2", qdot($"q", $"q"))
      .withColumn("bkt", Similarity.bucket($"q", Dedup.EmbeddingPlanes))
      .as[VecRow]
      .groupByKey(_.key)
      .transformWithState(new EmbedDupProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }
}

/** Per-shard keep-first embedding-dup state: LSH bucket → stored vectors. */
final class EmbedDupProcessor(ttl: TTLConfig)
  extends StatefulProcessor[String, EmbedDupStream.VecRow, EmbedDupStream.Annotated] {
  import EmbedDupStream._

  @transient private var buckets: MapState[java.lang.Long, VBucket] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buckets = getHandle.getMapState[java.lang.Long, VBucket](
      "vbuckets", Encoders.LONG, Encoders.product[VBucket], ttl)

  /** Exact `25·dot² ≥ 4·na²·nb²` with `dot > 0` — operands reach ~4e27,
    * so the comparison runs in BigInt (the batch plan's Decimal(38) arm). */
  private def near(a: VEntry, q: Seq[Long], n2: Long): Boolean = {
    var dot = 0L
    var i = 0
    val aq = a.q
    while (i < aq.length) { dot += aq(i) * q(i); i += 1 }
    dot > 0 && {
      val d = BigInt(dot)
      d * d * 25 >= BigInt(a.n2) * BigInt(n2) * 4
    }
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[VecRow],
      timerValues: TimerValues): Iterator[Annotated] = {
    rows.toArray.sortBy(_.vec_id).iterator.map { v =>
      // own bucket + every 1-bit flip: the symmetric spelling of the batch
      // probe-side radius-1 explode
      val probeKeys = v.bkt +:
        (0 until Dedup.EmbeddingPlanes).map(p => v.bkt ^ (1L << p))
      val dupOf = probeKeys.iterator
        .flatMap { k =>
          val boxed = java.lang.Long.valueOf(k)
          if (buckets.containsKey(boxed)) buckets.getValue(boxed).vecs else Nil
        }
        .filter(c => near(c, v.q, v.n2))
        .map(_.vec_id)
        .foldLeft(-1L)((m, id) => if (m < 0 || id < m) id else m)
      val own = java.lang.Long.valueOf(v.bkt)
      val cur = if (buckets.containsKey(own)) buckets.getValue(own).vecs else Seq.empty
      if (cur.size < Dedup.MaxBucket)
        buckets.updateValue(own, VBucket(cur :+ VEntry(v.vec_id, v.q, v.n2)))
      Annotated(v.key, v.vec_id, dupOf)
    }
  }
}
