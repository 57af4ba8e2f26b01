package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Tokenizer-training corpus statistics — the BPE merge-selection primitive
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"): rank adjacent symbol pairs by corpus frequency; the
  * top pair is the next merge rule.
  *
  * The at-scale shape is the classic BPE trainer optimization, distributed:
  * the corpus FIRST collapses to `(word, count)` — the only corpus-sized
  * shuffle, output bounded by vocabulary size — and all pair statistics are
  * then computed over the vocabulary weighted by word count. A 100 TB
  * corpus has a vocab many orders of magnitude smaller than its token
  * stream, so per-merge-iteration work after the one collapse is
  * vocab-sized, not corpus-sized (re-segmentation per merge operates on the
  * word list, never re-reading the corpus). The pair table itself is
  * alphabet²-bounded — tiny — so its ranking window is a legitimate
  * single-partition stage (pinned in `PlanAuditSpec`).
  */
object Tokenizer {

  /** Merge-candidate head size. */
  val TopPairs = 50

  /** Top [[TopPairs]] adjacent character pairs by corpus frequency
    * (frequency = Σ word-count over words containing the pair at each
    * position), with deterministic (count desc, pair) ranking. */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    bpePairsOf(s, Tables.table(s, dir, "documents"))

  /** [[bpePairs]] over any `(text)` table — fixture / probe entry point. */
  def bpePairsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    // corpus → vocabulary: the ONLY corpus-sized shuffle
    val words = docs
      .select(explode(tokens(lower($"text"))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("wcnt"))
    // vocab-sized: per-position char pairs weighted by word count
    val pairs = words
      .filter(length($"word") >= 2)
      .select($"wcnt", explode(expr(
        "transform(sequence(1, length(word) - 1), i -> " +
          "named_struct('a', substring(word, i, 1), 'b', substring(word, i + 1, 1)))"))
        .as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(sum($"wcnt").as("n"))
    // alphabet²-bounded ranking (≤ |charset|² rows)
    pairs
      .withColumn("rnk", row_number().over(Window.orderBy($"n".desc, $"a", $"b")))
      .filter($"rnk" <= TopPairs)
      .select($"rnk", $"a", $"b", $"n")
      .orderBy($"rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bpe_pairs" -> bpePairs _,
  )

  val oracles: Map[String, String] = Map(
    "q_text_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(${duckTokens("lower(text)")}) AS word FROM documents),
         |wc AS (SELECT word, count(*) AS wcnt FROM w GROUP BY word),
         |pl AS (SELECT wcnt, list_transform(generate_series(1, length(word) - 1),
         |    i -> [substr(word, i, 1), substr(word, i + 1, 1)]) AS ps
         |  FROM wc WHERE length(word) >= 2),
         |pu AS (SELECT wcnt, unnest(ps) AS p FROM pl),
         |agg AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(wcnt) AS BIGINT) AS n
         |  FROM pu GROUP BY 1, 2),
         |r AS (SELECT row_number() OVER (ORDER BY n DESC, a, b) AS rnk, a, b, n FROM agg)
         |SELECT CAST(rnk AS INT) AS rnk, a, b, n FROM r
         |WHERE rnk <= $TopPairs ORDER BY rnk""".stripMargin,
  )
}
