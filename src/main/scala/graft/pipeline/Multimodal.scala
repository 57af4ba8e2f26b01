package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, processed by a partition-batched decode operator.
  *
  * The real pipeline shape is: parquet blob column → `mapPartitions` batches →
  * decoder (image/audio codec) → feature columns. This container has no codec
  * libraries, so `decodeStub` below is a DETERMINISTIC FAKE decoder (clearly
  * marked): it derives pseudo-metadata (width/height/intensity) from the raw
  * bytes. Everything around it — the binary schema, the typed batch iterator,
  * the partition-preserving operator, the feature projection — is the real
  * Spark plumbing a codec would plug into, and is what the tests pin.
  *
  * Scale notes: decode is per-row CPU work with no shuffle (mapPartitions,
  * narrow); the blob column is pruned away immediately after feature
  * extraction so only small feature columns flow downstream.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, mean_intensity: Int, checksum: Long)

  /** ==== STUB ==== deterministic fake decoder standing in for a real codec
    * (no image/audio libraries in this environment). Byte-derived features:
    * a real implementation would parse the payload header instead.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    var sum = 0L
    var checksum = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b
      checksum = (checksum * 31 + b) % 9007199254740881L
      i += 1
    }
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = n,
      width = 1 + (n % 64),
      height = 1 + ((n / 64) % 64),
      mean_intensity = if (n == 0) 0 else (sum / n).toInt,
      checksum = checksum)
  }

  final case class FrameSample(doc_id: Long, frame_no: Int, offset: Int, frame_sum: Long)

  /** ==== STUB ==== frame sampling standing in for video frame extraction:
    * the payload is cut into fixed-size "frames" and every `stride`-th frame
    * is summarized (a real implementation would demux + decode keyframes).
    * Deterministic byte math so the plumbing is oracle-checkable.
    */
  def frameSampleStub(r: MediaRow, frameBytes: Int, stride: Int): Iterator[FrameSample] = {
    val bytes = r.payload
    val nFrames = bytes.length / frameBytes
    Iterator.range(0, nFrames).filter(_ % stride == 0).map { f =>
      var s = 0L
      var i = f * frameBytes
      val end = i + frameBytes
      while (i < end) { s += bytes(i) & 0xff; i += 1 }
      FrameSample(r.doc_id, f, f * frameBytes, s)
    }
  }

  /** ==== STUB ==== "resize": reduce the payload to a fixed number of
    * bucket-summed intensities (a real implementation would interpolate
    * pixels). Keeps the real operator shape: narrow per-row compute, fixed
    * small output width. */
  def resizeStub(r: MediaRow, buckets: Int): Array[Long] = {
    val bytes = r.payload
    val out = Array.ofDim[Long](buckets)
    var i = 0
    while (i < bytes.length) {
      out(i * buckets / bytes.length) += bytes(i) & 0xff
      i += 1
    }
    out
  }

  /** Declared query: every 2nd 64-byte frame per document, summarized. */
  def frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .flatMap(frameSampleStub(_, frameBytes = 64, stride = 2))
      .toDF()
      .orderBy($"doc_id", $"frame_no")
  }

  /** Documents exposed as a binary media table (payload = utf-8 bytes). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select($"doc_id", lit("text/plain").as("mime"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Partition-batched decode: the operator a real codec would run inside. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Declared query: decoded feature columns (blob pruned before output). */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(mediaTable(s, dir))
      .toDF()
      .select($"doc_id", $"mime", $"n_bytes", $"width", $"height",
        $"mean_intensity", $"checksum")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> features _,
    "q_multimodal_frames" -> frames _,
  )

  // Oracle reproduces the stub's byte math from the text chars (payload is
  // the UTF-8 encoding of ASCII text, so ord(char) == byte value).
  val oracles: Map[String, String] = Map(
    "q_multimodal_features" ->
      s"""WITH c AS (SELECT doc_id, text,
         |    list_transform(list_filter(string_split_regex(text, ''), ch -> ch <> ''),
         |      ch -> CAST(ord(ch) AS BIGINT)) AS bs
         |  FROM documents)
         |SELECT doc_id, 'text/plain' AS mime,
         |  CAST(len(bs) AS INT) AS n_bytes,
         |  CAST(1 + len(bs) % 64 AS INT) AS width,
         |  CAST(1 + (len(bs) // 64) % 64 AS INT) AS height,
         |  CAST(CAST(list_sum(bs) AS BIGINT) // len(bs) AS INT) AS mean_intensity,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), bs),
         |    (a, b) -> (a * 31 + b) % 9007199254740881) AS checksum
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      s"""WITH c AS (SELECT doc_id,
         |    list_transform(list_filter(string_split_regex(text, ''), ch -> ch <> ''),
         |      ch -> CAST(ord(ch) AS BIGINT)) AS bs
         |  FROM documents),
         |f AS (SELECT doc_id, bs, unnest(generate_series(0, len(bs) // 64 - 1)) AS frame_no
         |  FROM c WHERE len(bs) >= 64)
         |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
         |  CAST(frame_no * 64 AS INT) AS "offset",
         |  CAST(list_sum(bs[frame_no * 64 + 1 : frame_no * 64 + 64]) AS BIGINT) AS frame_sum
         |FROM f WHERE frame_no % 2 = 0
         |ORDER BY doc_id, frame_no""".stripMargin,
  )
}
