package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing.{charFoldHash, tokens}

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

  /** Bucket count for [[drift]]'s hashed-vocabulary distributions — same
    * rationale as [[Sampling.DsirBuckets]]: the distribution table is
    * B × sources rows, broadcast-sized at any corpus scale. */
  val DriftBuckets = 64

  /** Per-source DISTRIBUTION drift: chi-squared divergence between each
    * source's hashed-unigram bucket distribution and the corpus-wide one —
    * the content-level monitor the schema-level [[profile]] can't see (a
    * source whose vocabulary shifts between drops keeps its row counts and
    * lengths while its χ² jumps). χ²(P_s‖Q) = Σ_b (p_b − q_b)²/q_b, chosen
    * over KL/JS because it is RATIONAL in the counts: with p = c/t and
    * q = C/T the per-bucket term is (cT − Ct)²/(C·t²·T) — exact integer
    * arithmetic end-to-end, no ln to disagree on (the products pass int64,
    * so they run in Decimal(38), mirrored by the oracle's HUGEINT; per-bucket
    * terms are nonnegative so truncating `div` ≡ the oracle's floor `//`).
    *
    * Shape at scale: one corpus scan collapsing map-side to the
    * (source × bucket) count table; everything after is arithmetic on
    * broadcast-sized tables. Zero-count (source, bucket) cells still
    * contribute (their term is q_b), so the grid is completed by a
    * sources × buckets cross of two tiny tables before the left join. */
  def drift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.table(s, dir, "documents")
      .select($"source", explode(tokens($"text")).as("term"))
      .select($"source",
        (charFoldHash(concat(lit("drift:"), $"term")) % DriftBuckets).as("bkt"))
    val sb = toks.groupBy($"source", $"bkt").agg(count(lit(1)).as("c"))
    val ts = sb.groupBy($"source").agg(sum($"c").as("t_s"))
    val cb = sb.groupBy($"bkt").agg(sum($"c").as("cb"))
    val tot = cb.agg(sum($"cb").as("tt"))
    ts.crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
      .join(sb, Seq("source", "bkt"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
      .withColumn("term_micro", expr(
        "(CAST(c * tt - cb * t_s AS DECIMAL(38,0)) * (c * tt - cb * t_s) " +
          "* 1000000) div (CAST(cb AS DECIMAL(38,0)) * t_s * t_s * tt)"))
      .groupBy($"source")
      .agg(sum($"term_micro").as("chi2_micro"),
        sum(when($"c" > 0, 1L).otherwise(0L)).as("n_active"))
      .orderBy($"source")
  }

  /** Outlier threshold for [[outliers]] in centi-MADs: flag docs further
    * than 2.00 MADs from their source median. The classic 3σ-equivalent
    * (≈ 4.45 MADs, Leys et al. 2013) assumes heavy-tailed real corpora;
    * the screen here is the CONSERVATIVE first-pass review queue, and 2
    * MADs keeps it non-degenerate on near-uniform length distributions
    * too. Integer comparison `100·|x − med| > 200·MAD` — no float scale
    * constant (1.4826) anywhere, so the flag is engine-exact. */
  val OutlierCentiMads = 200L

  /** Robust per-source length-outlier screen — median / MAD (median
    * absolute deviation), the estimator that still works when the
    * contamination IS what you're hunting (mean/stddev are dragged by the
    * very outliers they're meant to flag; the median's breakdown point is
    * 50%). Both medians are the DISCRETE lower median (value at rank
    * ⌈n/2⌉, [[TextAnalysis.lengthStats]]'s exact-quantile convention) so
    * every output is an integer from the data, never an interpolation.
    *
    * Shape: two per-source window passes (rank selection over the stratum
    * sort — the exact-median plan; strata too large to sort swap in
    * `approx_percentile` exactly as lengthStats documents) plus two
    * broadcast-sized joins of the sources × 1 median tables back to the
    * scan. Flagged rows only: source, doc, length, and the med/MAD context
    * a reviewer needs to see WHY it flagged. */
  def outliers(s: SparkSession, dir: String): DataFrame =
    outliersOf(Tables.table(s, dir, "documents"))

  /** [[outliers]] over any `(source, doc_id, n_chars)` table — fixture
    * entry point. */
  def outliersOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs.select($"source", $"doc_id", $"n_chars")
    val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
    val wn = Window.partitionBy($"source")
    val med = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"source", $"n_chars".as("med"))
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs($"n_chars" - $"med"))
    val wd = Window.partitionBy($"source").orderBy($"dev", $"doc_id")
    val mad = dev
      .withColumn("rn", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(wn))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"source", $"dev".as("mad"))
    dev.join(broadcast(mad), "source")
      .filter($"dev" * 100L > $"mad" * OutlierCentiMads)
      .select($"source", $"doc_id", $"n_chars",
        $"med".as("med_chars"), $"mad".as("mad_chars"))
      .orderBy($"source", $"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profile _,
    "q_profile_drift" -> drift _,
    "q_profile_outliers" -> outliers _,
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
    "q_profile_drift" ->
      s"""WITH b AS (SELECT source,
         |    ${Hashing.duckCharFold("'drift:' || term")} % $DriftBuckets AS bkt
         |  FROM (SELECT source, unnest(${Hashing.duckTokens("text")}) AS term
         |        FROM documents)),
         |sb AS (SELECT source, bkt, CAST(count(*) AS BIGINT) AS c
         |  FROM b GROUP BY source, bkt),
         |ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS t_s FROM sb GROUP BY source),
         |cb AS (SELECT bkt, CAST(sum(c) AS BIGINT) AS cb FROM sb GROUP BY bkt),
         |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS tt FROM cb),
         |g AS (SELECT ts.source, cb.bkt, ts.t_s, cb.cb, tot.tt,
         |    COALESCE(sb.c, 0) AS c
         |  FROM ts CROSS JOIN cb CROSS JOIN tot
         |  LEFT JOIN sb ON sb.source = ts.source AND sb.bkt = cb.bkt)
         |SELECT source,
         |  CAST(sum((CAST(c * tt - cb * t_s AS HUGEINT) * (c * tt - cb * t_s)
         |    * 1000000) // (CAST(cb AS HUGEINT) * t_s * t_s * tt)) AS BIGINT)
         |    AS chi2_micro,
         |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active
         |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q_profile_outliers" ->
      s"""WITH base AS (SELECT source, doc_id, n_chars FROM documents),
         |rk AS (SELECT source, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n FROM base),
         |m AS (SELECT source, n_chars AS med FROM rk WHERE rn = (n + 1) // 2),
         |d AS (SELECT b.source, b.doc_id, b.n_chars, m.med,
         |    abs(b.n_chars - m.med) AS dev FROM base b JOIN m USING (source)),
         |dr AS (SELECT source, doc_id, dev,
         |    row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n FROM d),
         |md AS (SELECT source, dev AS mad FROM dr WHERE rn = (n + 1) // 2)
         |SELECT d.source, d.doc_id, d.n_chars,
         |  d.med AS med_chars, md.mad AS mad_chars
         |FROM d JOIN md USING (source)
         |WHERE 100 * d.dev > $OutlierCentiMads * md.mad
         |ORDER BY d.source, d.doc_id""".stripMargin,
  )
}
