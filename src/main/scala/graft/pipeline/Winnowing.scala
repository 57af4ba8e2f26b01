package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003, "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS algorithm): in every window of [[W]] consecutive k-gram hashes,
  * select the minimum (ties → RIGHTMOST, the paper's rule), and keep the
  * distinct selected positions. Guarantees: any shared substring of at
  * least W + K − 1 tokens produces at least one shared fingerprint, and
  * ~2/(W+1) of the grams are selected — position-robust overlap detection
  * at a fraction of the full span table ([[SpanDedup]] keeps EVERY span;
  * winnowing is its sub-linear fingerprint tier).
  *
  * Shape: one narrow fused pass to per-doc gram hashes (native ShingleMd5),
  * the window-argmin entirely inside per-row array lambdas (no shuffle), an
  * explode of the ~2/(W+1)-sized selection, and ONE distinct-free output —
  * positions are already deduped per doc by `array_distinct` before the
  * explode. The selection key is the md5 hex string: lexicographic order is
  * engine-agnostic, so the argmin (and therefore the fingerprint set) is
  * bit-identical in the oracle.
  */
object Winnowing {

  /** Tokens per k-gram (the noise threshold: matches shorter than K tokens
    * never fingerprint). */
  val K = 4
  /** Window width in grams (guarantee threshold t = W + K − 1 = 7). */
  val W = 4

  def winnow(s: SparkSession, dir: String): DataFrame =
    winnowOf(s, Tables.table(s, dir, "documents"))

  /** [[winnow]] over any `(doc_id, text)` table — fixture entry point. */
  def winnowOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    // 1-based gram positions; window j covers grams j .. j+W-1; argmin
    // seeded at j and folded left→right with `<=` so ties land rightmost.
    val selected = expr(
      s"""array_distinct(transform(sequence(1, size(hs) - ${W - 1}), j ->
         |  aggregate(sequence(j + 1, j + ${W - 1}),
         |    named_struct('pos', j, 'fp', element_at(hs, j)),
         |    (acc, i) -> IF(element_at(hs, i) <= acc.fp,
         |      named_struct('pos', i, 'fp', element_at(hs, i)), acc))))""".stripMargin)
    docs
      .select($"doc_id", shingleMd5(tokens($"text"), K).as("hs"))
      .filter(size($"hs") >= W)
      .select($"doc_id", explode(selected).as("s"))
      .select($"doc_id", $"s.pos".as("pos"), $"s.fp".as("fp"))
      .orderBy($"doc_id", $"pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_winnow" -> winnow _,
  )

  /** DuckDB k-gram md5 hashes (1-based positions), byte-identical to the
    * native ShingleMd5 — same construction as SpanDedup's oracle at k=K. */
  private def duckGramHashes(w: String): String = {
    val parts = (0 until K).map(j => s"$w[i+$j]").mkString(", ")
    s"CASE WHEN len($w) >= $K THEN " +
      s"list_transform(generate_series(1, len($w) - ${K - 1}), " +
      s"i -> md5('|' || concat_ws(' ', $parts))) ELSE [] END"
  }

  val oracles: Map[String, String] = Map(
    "q_text_winnow" ->
      s"""WITH d AS (SELECT doc_id, ${duckTokens("text")} AS w FROM documents),
         |g AS (SELECT doc_id, ${duckGramHashes("w")} AS hs FROM d),
         |sel AS (SELECT doc_id,
         |    list_transform(generate_series(1, len(hs) - ${W - 1}), j ->
         |      list_reduce(
         |        list_transform(generate_series(j, j + ${W - 1}),
         |          i -> struct_pack(pos := i, fp := hs[i])),
         |        (a, b) -> CASE WHEN b.fp <= a.fp THEN b ELSE a END)) AS ss
         |  FROM g WHERE len(hs) >= $W),
         |u AS (SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp
         |  FROM (SELECT doc_id, unnest(ss) AS s FROM sel))
         |SELECT doc_id, CAST(pos AS INT) AS pos, fp
         |FROM u ORDER BY doc_id, pos""".stripMargin,
  )
}
