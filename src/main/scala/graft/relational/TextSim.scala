package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity-search and text-analysis queries over the `embeddings` and
  * `documents` tables — the first slice of the training-data-pipeline surface
  * (the full dedup/ANN/text suite lives in graft.pipeline).
  */
object TextSim {

  /** dot(a, b) over two array<float> columns as a codegen'd expression chain:
    * zip_with multiplies, aggregate folds in array order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-10 vs the vec_id=0 query vector. The query vector
    * is fetched driver-side (one scalar row — a query CONSTANT, not data
    * movement) and inlined as a literal so the scan stays a single pass;
    * ranking doubles never leave the query (int keys out, FIXTURES.md §B.2).
    */
  def similarityCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.table(s, dir, "embeddings")
    val q: Seq[Float] = emb.filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Float]].head()
    val qCol = array(q.map(v => lit(v)): _*)
    emb.filter($"vec_id" =!= 0)
      .select($"vec_id", cosine($"embedding", qCol).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(10)
      .select($"vec_id")
  }

  /** Whitespace tokenization + global top-20 token counts.
    *
    * Bench note (r4 flagged a ~1.2 s outlier vs 0.1 s siblings): the plan is
    * the textbook one — narrow text-only scan → Generate(explode) → partial
    * agg → one word shuffle → TakeOrderedAndProject — and the gap is
    * first-execution cost, not plan work: measured 2.3 s cold vs 0.40 s for
    * the second run of the SAME query in one session, and 0.26 s for an
    * identically-shaped hand-built plan once codegen is warm. The stage's
    * whole-stage-codegen span (regex split + explode + hash agg) compiles
    * once per shape; at corpus scale the one-time compile vanishes into the
    * scan. */
  def textTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word")
      .limit(20)
  }

  /** [[typoPairs]] edit-distance threshold and minimum token length (a
    * 1–2-char word is within distance 2 of half the alphabet — noise). */
  val TypoMaxDist = 2
  val TypoMinLen = 3

  /** Fuzzy VOCABULARY self-join — typo/variant pair mining for vocabulary
    * normalization: token pairs within Levenshtein distance
    * [[TypoMaxDist]], with corpus counts (the rare side of a pair is the
    * misspelling candidate of the frequent side). The all-pairs
    * `levenshtein(a, b) ≤ k` join is O(V²); this is the FastSS deletion-
    * neighborhood blocking (Bocek et al. 2007): each token emits every
    * variant reachable by ≤ k deletions, candidates are pairs SHARING a
    * variant (sound: an edit script aligning a and b deletes ≤ k chars
    * from each side to a common subsequence), then a codegen'd
    * `levenshtein` verifies — the candidates→verify discipline of the
    * MinHash/SimHash suite, on the string-edit metric.
    *
    * Shape at scale: variants are per-row array lambdas (O(len²) ≈ 40
    * strings per word), ONE shuffle on the variant key, and the variant
    * buckets are ALPHABET-bounded (the words mapping to variant x are
    * those reachable by ≤ k insertions: ≤ (len+1)^k·|Σ|^k), so no
    * data-dependent hot key exists and no guard is needed. The vocab
    * itself is corpus-log-sized. Oracle: the independent O(V²) spelling. */
  def typoPairs(s: SparkSession, dir: String): DataFrame =
    typoPairsOf(Tables.table(s, dir, "documents"))

  /** [[typoPairs]] over any table with a `text` column — fixture entry
    * point. */
  def typoPairsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val v = docs
      .select(explode(split(lower($"text"), "\\s+")).as("w"))
      .filter($"w" =!= "" && length($"w") >= TypoMinLen)
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val del1 =
      "transform(sequence(1, length(%1$s)), i -> " +
        "concat(substring(%1$s, 1, i-1), substring(%1$s, i+1, length(%1$s))))"
    val variants = v.select($"w", $"c", explode(expr(
      s"""array_distinct(concat(
         |  array(w),
         |  ${del1.format("w")},
         |  flatten(transform(${del1.format("w")},
         |    x -> ${del1.format("x")}))))""".stripMargin)).as("var"))
    variants.as("a").join(variants.as("b"),
        col("a.var") === col("b.var") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"),
        col("a.c").as("c1"), col("b.c").as("c2"))
      .distinct()
      .filter(levenshtein($"w1", $"w2") <= TypoMaxDist)
      .withColumn("dist", levenshtein($"w1", $"w2").cast("int"))
      .orderBy($"w1", $"w2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_similarity_cosine" -> similarityCosine _,
    "q_text_tokens" -> textTokens _,
    "q_text_typo_pairs" -> typoPairs _,
  )

  val oracles: Map[String, String] = Map(
    "q_similarity_cosine" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q_text_tokens" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q_text_typo_pairs" ->
      s"""WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
         |  FROM documents),
         |v AS (SELECT w, count(*) AS c FROM t
         |  WHERE w <> '' AND length(w) >= $TypoMinLen GROUP BY w)
         |SELECT a.w AS w1, b.w AS w2, CAST(a.c AS BIGINT) AS c1,
         |  CAST(b.c AS BIGINT) AS c2,
         |  CAST(levenshtein(a.w, b.w) AS INT) AS dist
         |FROM v a JOIN v b
         |  ON a.w < b.w AND levenshtein(a.w, b.w) <= $TypoMaxDist
         |ORDER BY w1, w2""".stripMargin,
  )
}
