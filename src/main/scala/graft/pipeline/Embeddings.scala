package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Embedding-column aggregation: per-source centroids of the document
  * embeddings — the corpus-profiling step before IVF seeding or drift
  * monitoring. Shape: explode the 64 dimensions into long form and do ONE
  * `(source, dim)` hash aggregation — partial aggregation combines map-side,
  * so the shuffle carries at most `sources × dims` rows per task regardless
  * of corpus size; the alternative (`collect_list` of whole vectors per
  * group) materializes unbounded per-group state and dies exactly when
  * groups get big. All arithmetic exact integer over micro-quantized
  * components (sums < 2^53, so no precision cliff).
  */
object Embeddings {

  /** Per-(source, dimension) centroid component + vector count, exact
    * integer mean in micros. Docs join embeddings on `doc_id = vec_id`
    * (inner: only embedded docs contribute). */
  def centroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents").select($"doc_id", $"source")
    val vecs = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
    docs.join(vecs, $"doc_id" === $"vec_id")
      .select($"source", posexplode($"q"))
      .groupBy($"source", $"pos".as("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum($"col").as("sum_micro"))
      .select($"source", $"dim", $"n_vecs", $"sum_micro",
        expr("sum_micro div n_vecs").as("mean_micro"))
      .orderBy($"source", $"dim")
  }

  /** Int8 scalar-quantization audit: per-vector max-abs scale, symmetric
    * 127-level quantization, and the exact reconstruction error it costs —
    * the sanity report before shipping a quantized ANN index. Everything is
    * exact integer over micro-quantized components (`qi = comp·127 div
    * scale`, `recon = qi·scale div 127`; products < 2^47, far from the
    * 2^53 cliff), so the oracle comparison is bit-exact. Shape: one narrow
    * per-vector projection (scale via `array_max`), `posexplode` into long
    * form, one map-side-combinable `vec_id` aggregation — no joins, no
    * per-group state, scale-safe in the number of vectors. */
  def quantizeAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
      // clamp to 1: an all-zero vector has scale 0 (div-by-zero) but also
      // zero error under any positive scale, so the clamp is semantics-free
      .withColumn("scale",
        greatest(array_max(transform($"q", x => abs(x))), lit(1L)))
      .select($"vec_id", $"scale", explode($"q").as("comp"))
      .withColumn("err",
        expr("abs(comp - (((comp * 127L) div scale) * scale) div 127L)"))
      .groupBy($"vec_id", $"scale")
      .agg(sum($"err").as("sum_abs_err"), max($"err").as("max_err"),
        count(lit(1)).as("dims"))
      .orderBy($"vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embedding_centroids" -> centroids _,
    "q_embedding_quantize" -> quantizeAudit _,
  )

  val oracles: Map[String, String] = Map(
    // Parallel unnests in SELECT zip in DuckDB, so unnest(range(len(qv)))
    // yields the 0-based position alongside each component — same numbering
    // as Spark posexplode (WITH ORDINALITY is unimplemented in this DuckDB).
    // Integer mean: DuckDB `//` and Spark `div` both truncate toward zero
    // (verified: -7//2 = -3), so the division is exact-integer on both
    // sides — no float in the mean path at all.
    "q_embedding_centroids" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |j AS (SELECT d.source,
        |    unnest(q.qv) AS comp,
        |    unnest(range(len(q.qv))) AS dim
        |  FROM documents d JOIN q ON d.doc_id = q.vec_id)
        |SELECT source, CAST(dim AS INT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(comp) AS BIGINT) AS sum_micro,
        |  CAST(sum(comp) // count(*) AS BIGINT) AS mean_micro
        |FROM j GROUP BY source, dim ORDER BY source, dim""".stripMargin,
    // `//` and Spark's `div` both truncate toward zero (see above), and
    // comp may be negative, so qi/recon agree sign-exactly across engines.
    "q_embedding_quantize" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (SELECT vec_id, qv,
        |    greatest(list_max(list_transform(qv, x -> abs(x))), 1) AS scale
        |  FROM q),
        |e AS (SELECT vec_id, scale, unnest(qv) AS comp FROM s)
        |SELECT vec_id, CAST(scale AS BIGINT) AS scale,
        |  CAST(sum(abs(comp - (((comp * 127) // scale) * scale) // 127)) AS BIGINT) AS sum_abs_err,
        |  CAST(max(abs(comp - (((comp * 127) // scale) * scale) // 127)) AS BIGINT) AS max_err,
        |  CAST(count(*) AS BIGINT) AS dims
        |FROM e GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin,
  )
}
