package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality profiling — the audit pass a pipeline runs over a new drop
  * BEFORE spending compute on it: per-source completeness, metadata/payload
  * consistency, and range stats, as ONE map-side-combinable aggregate (the
  * shuffle carries `sources × 1` rows of fixed-width counters — a 100 TB
  * profile costs one scan). The consistency counters matter most: a
  * metadata column that disagrees with its payload (`n_chars ≠
  * length(text)`) is how silent upstream corruption usually shows up, and
  * catching it here is one narrow projection instead of a downstream
  * debugging week.
  */
object Profiling {

  /** Per-source profile: row/null/empty counts, metadata-payload mismatch
    * count, distinct language count, and n_chars range/sum. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(when($"text" === "", 1L).otherwise(0L)).as("n_empty_text"),
        sum(when(length($"text") =!= $"n_chars", 1L).otherwise(0L))
          .as("n_len_mismatch"),
        countDistinct($"lang").as("n_langs"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profile _,
  )

  val oracles: Map[String, String] = Map(
    "q_profile" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |  CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text,
        |  CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_len_mismatch,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
