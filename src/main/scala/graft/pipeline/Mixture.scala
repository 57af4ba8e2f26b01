package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Corpus-composition operators for training-data curation: deterministic
  * train/val/test splitting, token-budget mixture sampling, and an exact
  * histogram-based per-source quality gate. All three are reproducible
  * (salted content-independent hashes, never `rand()`) and keep the
  * 100 TB shape: per-document work is a narrow codegen'd projection or
  * filter; the only shuffles are over per-source aggregates (≤ the number
  * of sources, i.e. trivially broadcastable) or, for the split report, a
  * `sources × 3` hash aggregation with map-side partial combine.
  */
object Mixture {

  /** Split boundaries in percent: `[0,Train)` → train, `[Train,Val)` → val,
    * `[Val,100)` → test. */
  val TrainPct = 80
  val ValPct = 90

  /** Per-source character budget for [[mixture]] — sized so the rate is
    * ~40% at sf0.01 (≈7.5k chars/source) and ~4% at sf0.1 (≈74k), i.e. the
    * budget genuinely bites at both verify SFs. */
  val BudgetChars = 3000L

  /** Deterministic doc→split assignment, reported as per-(source, split)
    * doc and char counts — the shape of a split-manifest audit. The
    * assignment hash is salted independently of the sampling hashes so the
    * split is uncorrelated with any sample built from the same corpus. */
  /** Split label from any id column — md5-fold for avalanche (see
    * [[mixtureOf]]'s note), then the percent boundaries. */
  def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = charFoldHash(md5(concat(lit("split:"), id.cast("string")))) % 100
    when(h < TrainPct, "train").when(h < ValPct, "val").otherwise(lit("test"))
  }

  def split(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .withColumn("split", splitOf($"doc_id"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"source", $"split")
  }

  /** Leakage-free split: near-duplicate documents must land in the SAME
    * split, or held-out evaluation leaks training content through the
    * duplicate (Lee et al. '22 measure this directly). Split by the
    * near-dup CLUSTER id, not the doc id: MinHash-LSH verified pairs →
    * connected components → every member inherits the component minimum;
    * unpaired docs are their own singleton cluster. Scale shape: the
    * component map covers only paired docs (≪ corpus), so the corpus-side
    * join stays a broadcast/AQE-picked left join — the corpus itself is
    * never shuffled, and the split assignment is one narrow projection. */
  def splitLeakfree(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    val cc = Components.connectedComponents(
        Dedup.minhashPairsIndexed(s, dir).select($"doc_a", $"doc_b"))
      .select($"node".as("doc_id"), $"root")
    docs.select($"doc_id", $"source")
      .join(cc, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"root", $"doc_id"))
      .withColumn("split", splitOf($"cluster_id"))
      .select($"doc_id", $"cluster_id", $"split")
      .orderBy($"doc_id")
  }

  /** Cutoff for [[splitTemporal]] (the events table spans Jan 2024). */
  val TemporalCutoff = "2024-01-20 00:00:00"
  /** Embargo width: rows within this many hours AFTER the cutoff belong
    * to neither side. */
  val EmbargoHours = 24L

  /** TEMPORAL train/test split with an EMBARGO gap — backtest hygiene for
    * time-ordered data: the hash splits above are i.i.d. assignments, but
    * a model evaluated on events ADJACENT in time to its training rows
    * leaks through autocorrelation (the same session, the same trend).
    * Train = strictly before the cutoff; test = at/after cutoff +
    * [[EmbargoHours]]; the gap rows are QUARANTINED (kept, labeled
    * `embargo`, never silently dropped — the rates are audit output).
    * Output is the per-(split, type) composition with min/max epoch
    * seconds, which makes the non-overlap contract VISIBLE: every train
    * max_sec < cutoff ≤ every test min_sec − embargo.
    *
    * Shape at scale: one narrow three-way CASE on the second-truncated
    * event time (partition-prunable when the table is date-partitioned —
    * the cutoff predicate reaches the scan), then ONE map-side-combinable
    * (split, type) aggregate. The corpus is never shuffled beyond the
    * type²-bounded summary. */
  def splitTemporal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit(TemporalCutoff).cast("timestamp")
    val testFrom = lit(unix(TemporalCutoff) + EmbargoHours * 3600L)
    val ev = Tables.events(s, dir)
      .select($"event_type", unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("split",
        when($"sec" < unix_timestamp(cut), "train")
          .when($"sec" >= testFrom, "test")
          .otherwise("embargo"))
    ev.groupBy($"split", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        min($"sec").as("min_sec"), max($"sec").as("max_sec"))
      .orderBy($"split", $"event_type")
  }

  private def unix(t: String): Long =
    java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)

  /** Token-budget mixture sampling: pick a deterministic subset of each
    * source whose expected size hits a per-source character budget —
    * the "mix N billion tokens of web with M billion of code" step of a
    * pretraining data recipe. Two-phase, scale-safe:
    *
    *  1. per-source char totals — a map-side-combinable aggregate whose
    *     output is one row per source;
    *  2. keep-rate in exact integer micros, `min(1e6, budget·1e6 div
    *     total)`, broadcast-joined back and applied as one narrow
    *     hash-threshold filter.
    *
    * The corpus is never shuffled; re-running at any cluster size selects
    * the same documents. Integer `div` keeps the rate identical on both
    * engines (double division can differ by 1 ulp at 2^53 scale). */
  def mixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    mixtureOf(docs, rateTable(docs)).orderBy($"doc_id")
  }

  /** Per-source keep-rates in exact integer micros from a corpus snapshot —
    * one row per source. */
  def rateTable(docs: DataFrame, budget: Long = BudgetChars): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.groupBy($"source")
      .agg(sum($"n_chars").as("src_chars"))
      .select($"source",
        least(lit(1000000L),
          expr(s"(${budget}L * 1000000L) div src_chars")).as("rate_micro"))
  }

  /** The mixture filter on any `(doc_id, source, n_chars)` frame against a
    * precomputed rate table: a stream-static broadcast join + one stateless
    * narrow predicate, so the SAME code serves the backfill job and the
    * live ingest path (pinned streaming ≡ batch in `PipelineStreamSpec`).
    *
    * Fold over the md5 HEX of the salted id, not the id itself: the plain
    * char fold has weak avalanche (consecutive ids → near-consecutive
    * hashes, fine mod 100, badly clustered mod 1e6 — measured min(h%1e6)
    * ≈ 179k over 5k docs), while the md5 pre-mix makes the micro-threshold
    * genuinely uniform. */
  def mixtureOf(docs: DataFrame, rates: DataFrame, salt: String = "mix:"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.join(broadcast(rates), "source")
      .filter(
        charFoldHash(md5(concat(lit(salt), $"doc_id".cast("string")))) % 1000000L
          < $"rate_micro")
      .select($"doc_id", $"source", $"n_chars")
  }

  /** Per-source budget for [[mixtureBpe]], in REAL (learned-BPE) tokens —
    * sized so the rate threshold genuinely bites at the correctness scale
    * factors. */
  val BudgetBpeTokens = 2000L

  /** [[mixture]] with the budget measured in REAL tokens: per-source
    * totals and keep-rates computed over [[Tokenizer.bpeDocTokens]]
    * instead of character counts — with [[Curation.packBpe]], this closes
    * the r6-verdict gap end-to-end: every downstream token budget can now
    * run on what a tokenizer actually emits. Same shape as [[mixture]]:
    * one broadcast rate table, one narrow salted-hash filter, the corpus
    * never shuffled for the sample (the token-count input adds only the
    * vocab-sized broadcast join). */
  def mixtureBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    val enriched = docs.select($"doc_id", $"source")
      .join(Tokenizer.bpeDocTokens(s, dir), "doc_id")
    val rates = enriched.groupBy($"source")
      .agg(sum($"n_tokens").as("src_tokens"))
      .select($"source",
        least(lit(1000000L),
          expr(s"(${BudgetBpeTokens}L * 1000000L) div src_tokens")).as("rate_micro"))
    enriched.join(broadcast(rates), "source")
      .filter(
        charFoldHash(md5(concat(lit("bmix:"), $"doc_id".cast("string")))) % 1000000L
          < $"rate_micro")
      .select($"doc_id", $"source", $"n_tokens")
      .orderBy($"doc_id")
  }

  /** Temperature exponent α for [[temperatureRates]], in millis: 0.7 — the
    * multilingual up-sampling rule of XLM-R (Conneau et al. 2020, §3.1:
    * sample source i with probability ∝ p_i^α), flattening the source
    * distribution so small sources are over-represented relative to their
    * share. α = 1 recovers proportional sampling ([[rateTable]]'s shape);
    * α → 0 approaches uniform-over-sources. */
  val TempAlphaMilli = 700L
  /** Character budget for the temperature mixture (distinct from
    * [[BudgetChars]] so the two declared mixtures differ visibly). */
  val TempBudgetChars = 6000L

  /** Per-source keep-rates for temperature sampling: rate_i = min(1,
    * B·w_i / (W·n_i)) with w_i = floor(n_i^α · 1e6), W = Σ w_j — so the
    * EXPECTED kept characters from source i are ∝ w_i (the temperature
    * distribution) within budget B. The single float op (`pow`) is
    * floor-quantized to micros immediately; the rate arithmetic runs in
    * Decimal(38) (B·1e6·w_i reaches ~2e20, past int64), mirrored by the
    * oracle's HUGEINT. One row per source — broadcast-sized at any corpus
    * scale. */
  def temperatureRates(docs: DataFrame, budget: Long = TempBudgetChars): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs.groupBy($"source").agg(sum($"n_chars").as("src_chars"))
      .withColumn("w_micro",
        floor(pow($"src_chars".cast("double"), TempAlphaMilli / 1000.0) * 1e6)
          .cast("long"))
    val tot = counts.agg(sum($"w_micro").as("tot_w"))
    // `div` (IntegralDivide) truncates the EXACT decimal quotient — all
    // operands positive, so it equals the oracle's HUGEINT floor-division
    // '//' bit-for-bit. The previous floor(a / b) spelling first rounded
    // the Decimal(38,6) quotient HALF_UP, which could differ by 1 when the
    // exact quotient sits within ~5e-7 of an integer. (The one remaining
    // float op is pow() inside w_micro — floor-quantized to micros at the
    // source; a 1-ulp pow divergence between engines is accepted and
    // documented, same class as the perplexity ln() case.)
    counts.crossJoin(broadcast(tot))
      .select($"source",
        least(lit(1000000L), expr(
          s"CAST((CAST($budget AS DECIMAL(38,0)) * 1000000 * w_micro) div " +
            "(CAST(tot_w AS DECIMAL(38,0)) * src_chars) AS BIGINT)"))
          .as("rate_micro"))
  }

  /** The declared temperature-mixture query: α-flattened per-source rates,
    * then the same deterministic salted-hash Bernoulli filter as
    * [[mixture]] (distinct salt — the two samples are independent). */
  def mixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
    mixtureOf(docs, temperatureRates(docs), salt = "tmix:").orderBy($"doc_id")
  }

  /** Exact per-source median gate without a corpus-wide sort: keep documents
    * at or above their source's median length. The median comes from a
    * VALUE HISTOGRAM — `(source, n_chars)` counts (bounded by the number of
    * distinct lengths, not the corpus), a cumulative window over that small
    * frame, threshold = lowest value whose cumulative count reaches
    * `(total+1) div 2` (lower median) — then one broadcast join + narrow
    * filter over the corpus. The alternative (rank window over all rows per
    * source) sorts every row of a 100 TB stratum; this shape never sorts
    * the corpus at all. */
  def qualityGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gateOf(Tables.table(s, dir, "documents"))
      .groupBy($"source")
      .agg(min($"threshold").as("threshold"),
        count(lit(1)).as("n_kept"), sum($"n_chars").as("sum_chars_kept"))
      .orderBy($"source")
  }

  /** The gate itself on any `(doc_id, source, n_chars)` frame: rows at or
    * above their source's lower median, with the `threshold` column kept
    * for the report. Composable — [[recipe]] feeds its output straight
    * into [[mixtureOf]]. */
  def gateOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val hist = docs.groupBy($"source", $"n_chars").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"source").orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"source")
    val thresholds = hist
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("tot", sum($"cnt").over(wTot))
      .filter($"cum" >= expr("(tot + 1) div 2"))
      .groupBy($"source").agg(min($"n_chars").as("threshold"))
    docs.join(broadcast(thresholds), "source")
      .filter($"n_chars" >= $"threshold")
  }

  /** The full pretraining-data recipe as ONE Catalyst plan: median quality
    * gate → token-budget mixture over the survivors → split manifest.
    * Each stage is the already-oracled operator above; composing them in
    * one `DataFrame` lets the optimizer fuse the narrow filters and share
    * the scan, exactly like `q_pipeline_curate` does for the dedup chain.
    * Output is the per-(source, split) manifest a training job consumes. */
  def recipe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gated = gateOf(Tables.table(s, dir, "documents"))
      .select($"doc_id", $"source", $"n_chars")
    mixtureOf(gated, rateTable(gated))
      .withColumn("split", splitOf($"doc_id"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"source", $"split")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split" -> split _,
    "q_split_leakfree" -> splitLeakfree _,
    "q_split_temporal" -> splitTemporal _,
    "q_mixture" -> mixture _,
    "q_mixture_bpe" -> mixtureBpe _,
    "q_mixture_temperature" -> mixtureTemperature _,
    "q_quality_gate" -> qualityGate _,
    "q_pipeline_recipe" -> recipe _,
  )

  /** DuckDB: split label from id expression `e` (mirrors [[splitOf]]). */
  private def duckSplit(e: String): String = {
    val h = s"${duckCharFold(s"md5('split:' || CAST($e AS VARCHAR))")} % 100"
    s"CASE WHEN $h < $TrainPct THEN 'train' WHEN $h < $ValPct THEN 'val' ELSE 'test' END"
  }

  /** DuckDB: the mixture keep predicate (mirrors [[mixtureOf]]'s filter). */
  private val duckMixKeep =
    s"${duckCharFold("md5('mix:' || CAST(doc_id AS VARCHAR))")} % 1000000"

  /** DuckDB: gate CTEs over a docs relation `rel` → gated rows in `g`. */
  private def duckGateCtes(rel: String): String =
    s"""hist AS (SELECT source, n_chars, count(*) AS cnt
       |    FROM $rel GROUP BY source, n_chars),
       |c AS (SELECT source, n_chars,
       |    sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
       |    sum(cnt) OVER (PARTITION BY source) AS tot
       |  FROM hist),
       |t AS (SELECT source, min(n_chars) AS threshold FROM c
       |  WHERE cum >= (tot + 1) // 2 GROUP BY source),
       |g AS (SELECT d.doc_id, d.source, d.n_chars, t.threshold
       |  FROM $rel d JOIN t ON d.source = t.source
       |  WHERE d.n_chars >= t.threshold)""".stripMargin

  val oracles: Map[String, String] = Map(
    // three-way CASE on second-truncated epoch seconds, then the
    // (split, type) composition with visible min/max bounds
    "q_split_temporal" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
         |  FROM events),
         |a AS (SELECT event_type, sec,
         |    CASE WHEN sec < epoch(TIMESTAMP '$TemporalCutoff')
         |           THEN 'train'
         |         WHEN sec >= epoch(TIMESTAMP '$TemporalCutoff')
         |             + ${EmbargoHours * 3600L} THEN 'test'
         |         ELSE 'embargo' END AS split
         |  FROM e)
         |SELECT split, event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(min(sec) AS BIGINT) AS min_sec,
         |  CAST(max(sec) AS BIGINT) AS max_sec
         |FROM a GROUP BY split, event_type
         |ORDER BY split, event_type""".stripMargin,
    "q_split" ->
      s"""WITH a AS (SELECT source, n_chars, ${duckSplit("doc_id")} AS split
         |  FROM documents)
         |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM a GROUP BY source, split ORDER BY source, split""".stripMargin,
    "q_split_leakfree" ->
      s"""${Dedup.sigCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |${Dedup.candCtes},
         |${Dedup.ccCtes},
         |cc AS (SELECT node AS doc_id, min(reach) AS root
         |  FROM walk GROUP BY node),
         |a AS (SELECT d.doc_id, COALESCE(cc.root, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
         |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         |  ${duckSplit("cluster_id")} AS split
         |FROM a ORDER BY doc_id""".stripMargin,
    "q_pipeline_recipe" ->
      s"""WITH ${duckGateCtes("documents")},
         |r AS (SELECT source,
         |    least(1000000, (CAST($BudgetChars AS BIGINT) * 1000000) // sum(n_chars))
         |      AS rate_micro
         |  FROM g GROUP BY source),
         |m AS (SELECT g.doc_id, g.source, g.n_chars,
         |    ${duckSplit("g.doc_id")} AS split
         |  FROM g JOIN r ON g.source = r.source
         |  WHERE $duckMixKeep < r.rate_micro)
         |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM m GROUP BY source, split ORDER BY source, split""".stripMargin,
    "q_mixture" ->
      s"""WITH r AS (SELECT source,
         |    least(1000000, (CAST($BudgetChars AS BIGINT) * 1000000) // sum(n_chars))
         |      AS rate_micro
         |  FROM documents GROUP BY source)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d JOIN r ON d.source = r.source
         |WHERE ${duckCharFold("md5('mix:' || CAST(doc_id AS VARCHAR))")} % 1000000 < r.rate_micro
         |ORDER BY d.doc_id""".stripMargin,
    // REAL-token mixture: the BPE doc-token CTE chain, then the identical
    // rate/threshold math with token totals in place of character totals.
    "q_mixture_bpe" ->
      s"""WITH ${Tokenizer.duckDocTokensCtes},
         |e AS (SELECT d.doc_id, d.source, t.n_tokens
         |  FROM documents d JOIN dt t USING (doc_id)),
         |r AS (SELECT source,
         |    least(1000000, (CAST($BudgetBpeTokens AS BIGINT) * 1000000)
         |      // CAST(sum(n_tokens) AS BIGINT)) AS rate_micro
         |  FROM e GROUP BY source)
         |SELECT e.doc_id, e.source, e.n_tokens
         |FROM e JOIN r USING (source)
         |WHERE ${duckCharFold("md5('bmix:' || CAST(doc_id AS VARCHAR))")} % 1000000 < r.rate_micro
         |ORDER BY e.doc_id""".stripMargin,
    "q_mixture_temperature" ->
      s"""WITH c AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS src_chars
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, src_chars,
         |    CAST(floor(power(CAST(src_chars AS DOUBLE), ${TempAlphaMilli / 1000.0})
         |      * 1000000) AS BIGINT) AS w_micro
         |  FROM c),
         |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tot_w FROM w),
         |r AS (SELECT source,
         |    least(1000000, CAST((CAST($TempBudgetChars AS HUGEINT) * 1000000 * w_micro)
         |      // (CAST(tot_w AS HUGEINT) * src_chars) AS BIGINT)) AS rate_micro
         |  FROM w, t)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d JOIN r ON d.source = r.source
         |WHERE ${duckCharFold("md5('tmix:' || CAST(doc_id AS VARCHAR))")} % 1000000 < r.rate_micro
         |ORDER BY d.doc_id""".stripMargin,
    "q_quality_gate" ->
      s"""WITH hist AS (SELECT source, n_chars, count(*) AS cnt
         |    FROM documents GROUP BY source, n_chars),
         |c AS (SELECT source, n_chars,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
         |    sum(cnt) OVER (PARTITION BY source) AS tot
         |  FROM hist),
         |t AS (SELECT source, min(n_chars) AS threshold FROM c
         |  WHERE cum >= (tot + 1) // 2 GROUP BY source)
         |SELECT d.source, CAST(min(t.threshold) AS BIGINT) AS threshold,
         |  CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars_kept
         |FROM documents d JOIN t ON d.source = t.source
         |WHERE d.n_chars >= t.threshold
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
  )
}
