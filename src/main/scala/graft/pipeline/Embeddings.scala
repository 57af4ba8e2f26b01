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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embedding_centroids" -> centroids _,
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
  )
}
