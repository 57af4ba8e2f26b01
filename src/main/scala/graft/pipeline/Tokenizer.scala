package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------------------------------------------------------- BPE
  // train + encode: beyond pair statistics, the engine learns an ordered
  // merge list and APPLIES it — the tokenizer every downstream token count
  // (mixture budgets, packing) ultimately wants.

  /** Learned merges (applied in this order). */
  val NMerges = 16

  /** Training-vocabulary cap: merges are learned from the top [[VocabCap]]
    * words by (count desc, word) — the standard frequency-truncated
    * training vocabulary. At 100 TB the corpus collapses to a vocab ONCE
    * (the only corpus-sized shuffle), the capped head is collected to the
    * driver (bounded by construction — it IS the trainer's working set,
    * and the resulting merge list is the model), and encoding streams the
    * model back through a codegen'd expression. Encoding always covers the
    * FULL vocabulary; the cap only bounds what the trainer counts. */
  val VocabCap = 4000

  /** Output head of [[bpeEncode]] (token space is merge-bounded; the cap
    * only guards a degenerate charset). */
  val EncodeTop = 200

  /** Sentinel merge emitted once the pair table is exhausted (never matches
    * real text, so applying it is a no-op) — keeps the merge list a fixed
    * [[NMerges]] rows in both engines. */
  val Sentinel = "\u0001"

  /** Classic BPE trainer over a `(word, count)` vocabulary: [[nMerges]]
    * rounds of (count adjacent symbol pairs weighted by word count) →
    * (pick max by count desc, pair asc) → (greedy left-to-right rewrite).
    * Pure driver-side Scala — the input is the capped vocabulary, the
    * output is the model. */
  private[graft] def bpeTrain(
      vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String, Long)] = {
    val words = vocab.map { case (w, c) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val l = Character.charCount(w.codePointAt(i))
        buf += w.substring(i, i + l)
        i += l
      }
      (buf, c)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    while (step < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sy, c) =>
        var j = 0
        while (j + 1 < sy.length) {
          val k = (sy(j), sy(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      val pick =
        if (counts.isEmpty) (Sentinel, Sentinel, 0L)
        else {
          val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
          (a, b, n)
        }
      out += pick
      if (pick._3 > 0) words.foreach { case (sy, _) =>
        var r = 0
        var w = 0
        while (r < sy.length) {
          if (r + 1 < sy.length && sy(r) == pick._1 && sy(r + 1) == pick._2) {
            sy(w) = pick._1 + pick._2
            r += 2
          } else {
            sy(w) = sy(r)
            r += 1
          }
          w += 1
        }
        sy.dropRightInPlace(sy.length - w)
      }
      step += 1
    }
    out.result()
  }

  /** Train on `docs`: one corpus→vocab collapse, collect the capped head,
    * run [[bpeTrain]]. Returns (merge list, FULL cached vocab DF). */
  private[graft] def bpeModelOf(
      s: SparkSession, docs: DataFrame): (Seq[(String, String, Long)], DataFrame) = {
    import s.implicits._
    val words = docs
      .select(explode(tokens(lower($"text"))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("wcnt"))
      .cache() // two consumers: the capped collect + the full-vocab encode
    val capped = words.orderBy($"wcnt".desc, $"word").limit(VocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    (bpeTrain(capped, NMerges), words)
  }

  /** Declared query: the learned merge list itself `(rnk, a, b, n)` — the
    * model as a first-class, oracle-checkable output (the oracle REPLAYS
    * training as [[NMerges]] unrolled CTE rounds, the same pattern as the
    * IVF k-means oracle). */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, _) = bpeModelOf(s, Tables.table(s, dir, "documents"))
    merges.zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, n) }
      .toDF("rnk", "a", "b", "n")
      .orderBy($"rnk")
  }

  /** Declared query: ENCODE the corpus with the learned merges — subword-
    * token corpus frequencies `(tid, token, n)`. The apply step is the
    * codegen'd [[graft.functions.BpeApply]] over the full vocabulary
    * (vocab-sized, never corpus-sized: occurrences weight by word count),
    * so the only corpus-sized work remains the initial collapse. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, words) = bpeModelOf(s, Tables.table(s, dir, "documents"))
    val model = merges.map { case (a, b, _) => (a, b) }
    words
      .select($"wcnt",
        explode(graft.functions.BpeApply($"word", model)).as("token"))
      .groupBy($"token").agg(sum($"wcnt").as("n"))
      .withColumn("tid", row_number().over(Window.orderBy($"n".desc, $"token")))
      .filter($"tid" <= EncodeTop)
      .select($"tid", $"token", $"n")
      .orderBy($"tid")
  }

  /** Declared query: per-document REAL token counts under the learned
    * merges — the number every downstream budget (mixture, packing)
    * actually wants instead of whitespace-token approximations. The corpus
    * explodes to words and joins the BROADCAST vocab-sized per-word token
    * counts (BPE applies once per vocab word, not once per occurrence —
    * the amortization that matters when a 100 TB corpus repeats a ~100M-
    * word vocabulary billions of times). */
  def bpeDocTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    val (merges, words) = bpeModelOf(s, docs)
    val model = merges.map { case (a, b, _) => (a, b) }
    val perWord = words.select($"word",
      size(graft.functions.BpeApply($"word", model)).as("n_tok"))
    docs.select($"doc_id", explode(tokens(lower($"text"))).as("word"))
      .join(broadcast(perWord), Seq("word"))
      .groupBy($"doc_id").agg(sum($"n_tok").as("n_tokens"))
      .orderBy($"doc_id")
  }

  /** Built-in-only apply: the merge chain as literal string `replace`s over
    * the padded-symbol spelling — the oracle-shaped cross-check for
    * [[graft.functions.BpeApply]] (`BpeSpec` pins equality). Every symbol
    * is wrapped in its OWN leading+trailing space (`"abc"` →
    * `" a  b  c "`), so adjacent merge sites never share a boundary space
    * and non-overlapping left-to-right `replace` equals the greedy array
    * rewrite — with a SHARED single-space separator, `replace` consumes
    * the boundary and misses every immediately-adjacent second site. */
  private[graft] def bpeApplyHof(
      word: Column, merges: Seq[(String, String)]): Column = {
    val seg0 = regexp_replace(word, "(.)", " $1 ")
    val segN = merges.foldLeft(seg0) { case (sg, (a, b)) =>
      replace(sg, lit(s" $a  $b "), lit(s" $a$b "))
    }
    split(trim(segN), "  ")
  }

  /** DuckDB: vocabulary + padded-symbol segmentation CTEs (`v`, `w0`). */
  private def duckVocabCtes: String =
    s"""v AS MATERIALIZED (SELECT word, count(*) AS wcnt FROM
       |    (SELECT unnest(${duckTokens("lower(text)")}) AS word FROM documents)
       |  GROUP BY word),
       |w0 AS MATERIALIZED (SELECT word, wcnt,
       |    row_number() OVER (ORDER BY wcnt DESC, word) <= $VocabCap AS cap,
       |    regexp_replace(word, '(.)', ' \\1 ', 'g') AS seg
       |  FROM v)""".stripMargin

  /** DuckDB: one unrolled training round `i` — pair stats over the capped
    * vocab (`p`), deterministic pick (`k`), sentinel-guarded pick (`g`),
    * rewritten segmentation (`w`). Mirrors [[bpeTrain]] exactly. */
  private def duckMergeIter(i: Int): String =
    s"""p$i AS MATERIALIZED (SELECT pr[1] AS a, pr[2] AS b, CAST(sum(wcnt) AS BIGINT) AS n FROM
       |    (SELECT wcnt, unnest(list_transform(generate_series(1, len(sy) - 1),
       |        j -> [sy[j], sy[j + 1]])) AS pr
       |      FROM (SELECT wcnt, string_split(trim(seg), '  ') AS sy
       |            FROM w${i - 1} WHERE cap)
       |      WHERE len(sy) >= 2)
       |  GROUP BY 1, 2),
       |k$i AS (SELECT a, b, n FROM
       |    (SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rn FROM p$i)
       |  WHERE rn = 1),
       |g$i AS MATERIALIZED (SELECT coalesce(k.a, chr(1)) AS a, coalesce(k.b, chr(1)) AS b,
       |    coalesce(k.n, CAST(0 AS BIGINT)) AS n
       |  FROM (SELECT 1 AS one) o LEFT JOIN k$i k ON true),
       |w$i AS MATERIALIZED (SELECT w.word, w.wcnt, w.cap,
       |    replace(w.seg, ' ' || g.a || '  ' || g.b || ' ',
       |      ' ' || g.a || g.b || ' ') AS seg
       |  FROM w${i - 1} w CROSS JOIN g$i g)""".stripMargin

  private def duckTrainCtes: String =
    (duckVocabCtes +: (1 to NMerges).map(duckMergeIter)).mkString(",\n")

  /** TOKENIZER FERTILITY per source — BPE tokens emitted per whitespace
    * word, in exact milli-units (r11): the standard tokenizer-fit
    * diagnostic of a pretraining mixture (Rust et al. 2021): a source
    * whose fertility runs hot relative to the rest is one the merge
    * vocabulary underfits (wrong language/domain), which inflates its
    * effective token cost in every downstream budget (`q_mixture_bpe`,
    * `q_text_pack_bpe`). Rides the trained merge list unchanged: the
    * vocab-bounded per-word token counts broadcast onto one token
    * explode, reduced per source — no new corpus-sized work beyond the
    * explode every BPE consumer already pays. */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    val (merges, words) = bpeModelOf(s, docs)
    val model = merges.map { case (a, b, _) => (a, b) }
    val perWord = words.select($"word",
      size(graft.functions.BpeApply($"word", model)).as("n_tok"))
    docs.select($"source", explode(tokens(lower($"text"))).as("word"))
      .join(broadcast(perWord), Seq("word"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_words"), sum($"n_tok").as("n_tokens"))
      .withColumn("fertility_milli", expr("(n_tokens * 1000) div n_words"))
      .orderBy($"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bpe_pairs" -> bpePairs _,
    "q_text_bpe_merges" -> bpeMerges _,
    "q_text_bpe_encode" -> bpeEncode _,
    "q_text_bpe_doc_tokens" -> bpeDocTokens _,
    "q_text_bpe_fertility" -> bpeFertility _,
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
    "q_text_bpe_merges" ->
      s"""WITH $duckTrainCtes,
         |m AS (${(1 to NMerges).map(i =>
               s"SELECT CAST($i AS INT) AS rnk, a, b, n FROM g$i")
             .mkString("\n  UNION ALL ")})
         |SELECT rnk, a, b, n FROM m ORDER BY rnk""".stripMargin,
    "q_text_bpe_encode" ->
      s"""WITH $duckTrainCtes,
         |t AS (SELECT unnest(string_split(trim(seg), '  ')) AS token, wcnt
         |  FROM w$NMerges),
         |agg AS (SELECT token, CAST(sum(wcnt) AS BIGINT) AS n FROM t GROUP BY token),
         |r AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS tid,
         |    token, n FROM agg)
         |SELECT tid, token, n FROM r WHERE tid <= $EncodeTop ORDER BY tid""".stripMargin,
    "q_text_bpe_doc_tokens" ->
      s"""WITH $duckDocTokensCtes
         |SELECT doc_id, n_tokens FROM dt ORDER BY doc_id""".stripMargin,
    // per-source fertility over the same trained chain: every word is in
    // the vocab (trained on the full corpus), so per-doc word counts equal
    // the token-list lengths
    "q_text_bpe_fertility" ->
      s"""WITH $duckDocTokensCtes,
         |dwc AS (SELECT doc_id, source,
         |    len(${duckTokens("lower(text)")}) AS n_words
         |  FROM documents)
         |SELECT dwc.source,
         |  CAST(sum(dwc.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(dt.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST((sum(dt.n_tokens) * 1000) // sum(dwc.n_words) AS BIGINT)
         |    AS fertility_milli
         |FROM dt JOIN dwc USING (doc_id)
         |GROUP BY dwc.source ORDER BY dwc.source""".stripMargin,
  )

  /** DuckDB: training + per-doc real token counts, ending in
    * `dt (doc_id, n_tokens)` — shared by the doc-tokens oracle and the
    * BPE-budget packing oracle ([[Curation]]). */
  private[pipeline] def duckDocTokensCtes: String =
    s"""$duckTrainCtes,
       |wt AS (SELECT word, len(string_split(trim(seg), '  ')) AS n_tok
       |  FROM w$NMerges),
       |dw AS (SELECT doc_id, unnest(${duckTokens("lower(text)")}) AS word
       |  FROM documents),
       |dt AS (SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM dw JOIN wt USING (word) GROUP BY doc_id)""".stripMargin
}
