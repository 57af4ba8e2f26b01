package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Deterministic sampling for training-data curation. Both operators key
  * off a salted content-independent hash of `doc_id`, NOT `rand()` or
  * `TABLESAMPLE`: the sample must be reproducible across runs, cluster
  * sizes, and partitionings (a re-run of a 100 TB curation job has to pick
  * the SAME documents), and salting makes independent samples composable
  * (a different salt → a disjoint-in-expectation sample for eval holdout).
  *
  * - [[bernoulli]]: keep-if-hash-below-rate — one narrow codegen'd filter,
  *   no shuffle, pushdown-friendly.
  * - [[stratified]]: exact per-stratum quota (smallest-hash-first) in the
  *   scale-safe two-phase shape: a map-side-combinable per-stratum count
  *   broadcast back as a hash-threshold prefilter (keeps ~oversample×quota
  *   rows per stratum), then the exact row_number window only over the
  *   survivors. The window's per-stratum sort — the part that dies on a
  *   100 TB skewed stratum — runs on a bounded candidate set instead of the
  *   full table.
  */
object Sampling {

  /** Bernoulli keep-rate, percent. */
  val SamplePct = 10
  /** Per-stratum quota for [[stratified]] — sized so the quota bites at the
    * verify SFs (25 docs/source at sf0.01, 250 at sf0.1: the window trims at
    * both, the prefilter additionally at sf0.1). */
  val Quota = 10
  /** Prefilter oversampling factor (survivor budget = Over × Quota). */
  val Over = 4

  /** Deterministic 10% Bernoulli sample of `documents`. */
  def bernoulli(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bernoulliOf(Tables.table(s, dir, "documents"))
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** The Bernoulli filter on any frame with a `doc_id` — a stateless
    * predicate, identical on batch and streaming frames. */
  def bernoulliOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.filter(
      charFoldHash(concat(lit("sample:"), $"doc_id".cast("string"))) % 100
        < SamplePct)
  }

  /** Exact per-`source` quota sample: the [[Quota]] smallest salted hashes
    * win, ties impossible (hash salted by unique doc_id). */
  def stratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
      .withColumn("h", charFoldHash(concat(lit("strat:"), $"doc_id".cast("string"))))
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("src_n"))
    val budget = Over * Quota
    // Exact integer division on both engines (double division of 2^53-scale
    // values can differ from floor-div by 1 ulp → oracle mismatch).
    val survivors = docs.join(broadcast(counts), "source")
      .filter($"src_n" <= budget || $"h" < expr(s"(${M}L div src_n) * $budget"))
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    survivors
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= Quota)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Target expected keep-rate (percent of docs) for [[weighted]] at the
    * corpus mean weight. */
  val WeightedPct = 20L

  /** Length-weighted deterministic sampling: keep probability proportional
    * to `n_chars` (the token-budget proxy — sampling docs
    * length-proportionally makes every TOKEN equally likely to survive,
    * the right marginal when the downstream budget is tokens, not docs).
    * Each doc keeps iff `hash % 1e6 < rate_micro` with
    * `rate_micro = min(1e6, n_chars·[[WeightedPct]]·1e6 div (100·mean))`,
    * the mean from ONE tiny map-side-combinable aggregate broadcast back —
    * the corpus itself is never shuffled, and a re-run at any cluster size
    * keeps the SAME docs. `rate_micro` rides along in the output: it is the
    * exact inclusion probability, which downstream estimators divide by
    * (Horvitz–Thompson) to stay unbiased. All arithmetic exact integer
    * (micro rates, `div`), per the oracle-determinism rules; the hash gets
    * the md5 pre-mix because a mod-1e6 threshold needs avalanche the plain
    * char fold lacks (same rationale as [[Mixture.mixtureOf]]). */
  def weighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    // Exact integer mean (floor): double division can differ from floor-div
    // by 1 ulp → oracle mismatch, same rationale as [[stratified]].
    val stats = docs.agg(expr("sum(n_chars) div count(1)").as("mean_chars"))
    docs.crossJoin(broadcast(stats))
      .withColumn("rate_micro",
        least(lit(1000000L),
          expr(s"(n_chars * ${WeightedPct}L * 1000000L) div (100L * mean_chars)")))
      .filter(
        charFoldHash(md5(concat(lit("wsamp:"), $"doc_id".cast("string"))))
          % 1000000L < $"rate_micro")
      .select($"doc_id", $"source", $"n_chars", $"rate_micro")
      .orderBy($"doc_id")
  }

  /** Hashed-feature bucket count for [[dsir]]. Small so the bucket table is
    * trivially broadcastable; production DSIR uses ~10k buckets, still a
    * broadcast (the model IS the bucket table — vocab-independent size). */
  val DsirBuckets = 64
  /** Selection budget: the [[DsirTopK]] highest-importance raw docs win. */
  val DsirTopK = 100
  /** The target domain: docs whose distribution the selection should match. */
  val DsirTarget = "src0"

  /** DSIR-style importance selection (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"): fit
    * bag-of-hashed-unigram models on a TARGET slice (here `source =
    * `[[DsirTarget]]) and on the RAW rest, score every raw doc by its
    * importance log-weight Σ_tokens ln(p_target(bucket)/p_raw(bucket))
    * (+1-smoothed), and keep the top-[[DsirTopK]]. The paper resamples with
    * Gumbel noise; the deterministic top-k is the reproducible-curation
    * variant (same rationale as the salted hashes above — a 100 TB re-run
    * must pick the SAME docs).
    *
    * Shape at scale: the corpus tokenizes in two narrow passes — one
    * collapsing map-side to the [[DsirBuckets]]-row histogram (broadcast
    * back joined, never shuffled by corpus size), one scoring pass joined
    * against the broadcast ratio table, then a doc_id aggregate and a
    * global top-k (TakeOrderedAndProject: per-partition heads, one tiny
    * final merge — no full sort). Determinism: the one float op
    * `ln(ratio-of-exact-int64-products)` floor-quantized to micros
    * immediately, the [[TextAnalysis.perplexity]] precedent; scores stay
    * summed integers, no division (Spark `div` truncates toward zero while
    * DuckDB `//` floors — they disagree on negative log-weights). */
  def dsir(s: SparkSession, dir: String): DataFrame =
    dsirOf(Tables.table(s, dir, "documents"), DsirTarget, DsirTopK)

  /** [[dsir]] over any `(doc_id, source, text)` frame — the fixture /
    * library entry point (`DsirSpec` drives it with a planted vocabulary
    * split and a brute-force oracle). */
  def dsirOf(docs: DataFrame, target: String, topK: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select($"doc_id", $"source", explode(tokens($"text")).as("term"))
      .withColumn("bkt",
        charFoldHash(concat(lit("dsir:"), $"term")) % DsirBuckets)
    val hist = toks.groupBy($"bkt").agg(
      sum(when($"source" === target, 1L).otherwise(0L)).as("tc"),
      sum(when($"source" =!= target, 1L).otherwise(0L)).as("rc"))
    val tot = hist.agg(sum($"tc").as("tt"), sum($"rc").as("rt"))
    // (tc+1)(rt+B) ≤ ~2^35 at sf0.1 — exact in int64 (and in double, < 2^53),
    // so the ln argument is a ratio of exactly-represented integers on both
    // engines; at 100 TB the products move to Decimal before the ln.
    val ratios = hist.crossJoin(broadcast(tot))
      .select($"bkt",
        floor(log((($"tc" + 1L) * ($"rt" + DsirBuckets)).cast("double") /
          (($"rc" + 1L) * ($"tt" + DsirBuckets)).cast("double")) * 1e6)
          .cast("long").as("lr_micro"))
    toks.filter($"source" =!= target)
      .join(broadcast(ratios), "bkt")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_tok"),
        sum($"lr_micro").as("logw_micro"))
      .orderBy($"logw_micro".desc, $"doc_id")
      .limit(topK)
      .select($"doc_id", $"n_tok", $"logw_micro")
  }

  /** The FROZEN DSIR model: the per-bucket log-ratio table as a plain
    * [[DsirBuckets]]-element array — like the BPE merge list, driver-side
    * state IS the model (64 longs; production's ~10k-bucket model is still
    * KBs). The bounded collect here is the model-fitting step, not a data
    * movement; fit once on a batch snapshot, then [[dsirScorerOf]] applies
    * it statelessly anywhere — including a live ingest stream. The Scala
    * `math.log` is bit-identical to the Column `log` (both Java Math.log),
    * so scorer output ≡ [[dsirOf]]'s join-path scores (pinned in
    * `PipelineStreamSpec`). */
  def dsirModel(docs: DataFrame, target: String): Array[Long] = {
    import docs.sparkSession.implicits._
    val hist = docs
      .select($"source", explode(tokens($"text")).as("term"))
      .select($"source",
        (charFoldHash(concat(lit("dsir:"), $"term")) % DsirBuckets).as("bkt"))
      .groupBy($"bkt").agg(
        sum(when($"source" === target, 1L).otherwise(0L)).as("tc"),
        sum(when($"source" =!= target, 1L).otherwise(0L)).as("rc"))
      .collect().map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tt = hist.valuesIterator.map(_._1).sum
    val rt = hist.valuesIterator.map(_._2).sum
    Array.tabulate(DsirBuckets) { b =>
      val (tc, rc) = hist.getOrElse(b, (0L, 0L))
      math.floor(math.log(((tc + 1L) * (rt + DsirBuckets)).toDouble /
        ((rc + 1L) * (tt + DsirBuckets)).toDouble) * 1e6).toLong
    }
  }

  /** Stateless per-row DSIR scoring with a frozen [[dsirModel]]: the
    * 64-long model rides as a LITERAL array into codegen (element_at by
    * bucket — no join, no shuffle, no state), so the same transform runs on
    * batch frames and append-mode streams unchanged — the
    * fit-offline/score-online split every production scorer uses. */
  def dsirScorerOf(model: Array[Long]): DataFrame => DataFrame = { docs =>
    val s = docs.sparkSession
    import s.implicits._
    graft.plans.ModelBudget.assertWithinBudget("dsir log-ratio model", model)
    val lrs = typedLit(model.toSeq)
    docs.withColumn("n_tok", size(tokens($"text")).cast("int"))
      .withColumn("logw_micro",
        aggregate(
          transform(tokens($"text"), t =>
            element_at(lrs,
              ((charFoldHash(concat(lit("dsir:"), t)) % DsirBuckets) + 1L)
                .cast("int"))),
          lit(0L), (acc, x) => acc + x))
  }

  /** [[priority]] sample size (fixed k — the budget, unlike [[weighted]]'s
    * fixed RATE). */
  val PriorityK = 100

  /** PRIORITY SAMPLING (Duffield, Lund & Thorup, JACM 2007) — the
    * fixed-SIZE weighted sample with near-optimal variance: each doc draws
    * a deterministic uniform u ∈ (0, 1] from its salted hash, gets
    * priority w/u (w = n_chars), and the top-[[PriorityK]] priorities win.
    * The (k+1)-th priority τ is the estimation threshold: every sampled
    * doc carries `est_chars = max(w, τ)`, and Σ est_chars over the sample
    * is an unbiased estimator of the corpus total — the
    * Horvitz–Thompson-style guarantee that makes the sample USABLE for
    * downstream token accounting, which a plain top-k-by-weight sample
    * (deterministic, biased) cannot give. [[weighted]] is the fixed-rate
    * Poisson cousin; this is the fixed-budget one.
    *
    * Exact integers: u_micro ∈ [1, 10^6], priority = (w·10^12) div
    * u_micro (≤ 10^16 at any realistic doc length), τ back to weight
    * units by div 10^6. Shape at scale: one narrow projection, the
    * global top-(k+1) collapses to TakeOrderedAndProject via
    * LimitPushdownThroughWindow (no corpus sort), τ is a 1-row aggregate
    * of a (k+1)-row table, and the sample joins it broadcast. */
  def priority(s: SparkSession, dir: String): DataFrame =
    priorityOf(Tables.table(s, dir, "documents"), PriorityK)

  /** [[priority]] over any `(doc_id, source, n_chars)` table with an
    * explicit k — fixture entry point (the k ≥ n case pins the
    * exact-total property: τ = 0 ⇒ est ≡ w ⇒ Σ est = Σ w). */
  private[graft] def priorityOf(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs
      .withColumn("u",
        charFoldHash(concat(lit("prio:"), $"doc_id".cast("string")))
          % 1000000L + 1L)
      .select($"doc_id", $"source", $"n_chars",
        expr("(n_chars * 1000000000000L) div u").as("prio"))
    val w = Window.orderBy($"prio".desc, $"doc_id")
    val ranked = base.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k + 1)
    val tau = ranked.filter($"rnk" === k + 1)
      .agg(coalesce(max($"prio"), lit(0L)).as("tau"))
    ranked.filter($"rnk" <= k)
      .crossJoin(broadcast(tau))
      .select($"doc_id", $"source", $"n_chars", $"prio",
        greatest($"n_chars", expr("tau div 1000000L")).as("est_chars"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> bernoulli _,
    "q_sample_stratified" -> stratified _,
    "q_sample_weighted" -> weighted _,
    "q_sample_dsir" -> dsir _,
    "q_sample_priority" -> priority _,
  )

  private def saltHash(salt: String) =
    duckCharFold(s"'$salt:' || CAST(doc_id AS VARCHAR)")

  val oracles: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${saltHash("sample")} % 100 < $SamplePct
         |ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      s"""WITH s AS (SELECT sum(n_chars) // count(*) AS mean_chars FROM documents),
         |r AS (SELECT doc_id, source, n_chars,
         |    least(1000000, (n_chars * $WeightedPct * 1000000)
         |      // (100 * s.mean_chars)) AS rate_micro
         |  FROM documents, s)
         |SELECT doc_id, source, n_chars, CAST(rate_micro AS BIGINT) AS rate_micro
         |FROM r
         |WHERE ${duckCharFold("md5('wsamp:' || CAST(doc_id AS VARCHAR))")} % 1000000 < rate_micro
         |ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang, source, n_chars,
         |    ${saltHash("strat")} AS h FROM documents),
         |c AS (SELECT source, count(*) AS src_n FROM h GROUP BY source),
         |f AS (SELECT h.* FROM h JOIN c USING (source)
         |  WHERE c.src_n <= ${Over * Quota}
         |     OR h.h < (CAST($M AS BIGINT) // c.src_n) * ${Over * Quota}),
         |r AS (SELECT doc_id, lang, source, n_chars,
         |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
         |  FROM f)
         |SELECT doc_id, lang, source, n_chars FROM r
         |WHERE rk <= $Quota ORDER BY doc_id""".stripMargin,
    "q_sample_dsir" ->
      s"""WITH b AS (SELECT doc_id, source,
         |    ${duckCharFold("'dsir:' || term")} % $DsirBuckets AS bkt
         |  FROM (SELECT doc_id, source, unnest(${duckTokens("text")}) AS term
         |        FROM documents)),
         |h AS (SELECT bkt,
         |    sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS tc,
         |    sum(CASE WHEN source <> '$DsirTarget' THEN 1 ELSE 0 END) AS rc
         |  FROM b GROUP BY bkt),
         |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM h),
         |r AS (SELECT bkt,
         |    CAST(floor(ln(CAST((tc + 1) * (rt + $DsirBuckets) AS DOUBLE)
         |      / CAST((rc + 1) * (tt + $DsirBuckets) AS DOUBLE)) * 1000000)
         |      AS BIGINT) AS lr_micro
         |  FROM h, tot)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
         |  CAST(sum(lr_micro) AS BIGINT) AS logw_micro
         |FROM b JOIN r USING (bkt)
         |WHERE source <> '$DsirTarget'
         |GROUP BY doc_id
         |ORDER BY logw_micro DESC, doc_id LIMIT $DsirTopK""".stripMargin,
    // priority = (w·1e12) div u with the same salted-hash u; τ = the
    // (k+1)-th priority; est = max(w, τ div 1e6) — the DLT estimator
    "q_sample_priority" ->
      s"""WITH b AS (SELECT doc_id, source, n_chars,
         |    (n_chars * 1000000000000) //
         |      (${saltHash("prio")} % 1000000 + 1) AS prio
         |  FROM documents),
         |r AS (SELECT doc_id, source, n_chars, prio,
         |    row_number() OVER (ORDER BY prio DESC, doc_id) AS rnk FROM b),
         |t AS (SELECT COALESCE(max(CASE WHEN rnk = ${PriorityK + 1} THEN prio END), 0)
         |    AS tau FROM r WHERE rnk <= ${PriorityK + 1})
         |SELECT doc_id, source, n_chars, CAST(prio AS BIGINT) AS prio,
         |  CAST(greatest(n_chars, tau // 1000000) AS BIGINT) AS est_chars
         |FROM r, t WHERE rnk <= $PriorityK ORDER BY doc_id""".stripMargin,
  )
}
