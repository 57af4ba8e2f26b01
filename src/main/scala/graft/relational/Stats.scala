package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Descriptive second-moment statistics — covariance / correlation — as
  * EXACT INTEGER cross-moment aggregates, the classic profiling pair the
  * engine's inventory lacked (reference: none — no aggregates at all).
  * Floating `corr()` is not oracle-comparable (summation order changes
  * the last ulps), so the suite computes Pearson through the integer
  * moment identities instead:
  *
  *   cov_num = n·Σxy − Σx·Σy   (= n² · covariance),
  *   var_num = n·Σx² − (Σx)²   (= n² · variance),
  *   corr²·10⁴ = ((cov_num² div var_x_num) · 10⁴) div var_y_num
  *
  * with the division order chosen so every intermediate fits: cov_num²
  * (≈10³² at sf0.1 in the hectodollar units below) stays inside
  * Decimal(38)/HUGEINT, the first `div` drops the value into long range
  * BEFORE the 10⁴ scale-up, and every `div` operand is non-negative —
  * the one regime where Spark's truncate-toward-zero and DuckDB's
  * floor agree. The covariance's sign travels as its own column.
  * Metrics are integer HECTODOLLARS (`floor(price) div 100` — integer
  * div, no float division anywhere), the pre-scaling discipline of the
  * collocations T² fix: at a larger corpus the unit coarsens, the
  * arithmetic never overflows silently.
  *
  * Computed over PER-ORDER derived metrics (items per order, order
  * line-total, max item) because those are genuinely correlated — raw
  * lineitem columns are synthetically independent and profile to 0 bp.
  *
  * Shape at scale: one map-side-combinable per-order rollup, then ONE
  * global moment aggregate (10 sums in a single pass, every product
  * cast to Decimal(38) before summation so a 100 TB corpus cannot
  * silently wrap a long), exploded into the pair-bounded output. */
object Stats {

  private val Pairs = Seq(
    ("max_item_husd", "total_husd", "x23", "s3", "q3", "s2", "q2"),
    ("n_items", "max_item_husd", "x13", "s1", "q1", "s3", "q3"),
    ("n_items", "total_husd", "x12", "s1", "q1", "s2", "q2"),
  )

  /** The shared one-pass moment aggregate: a 1-row frame with n and the
    * 9 (Σ, Σ², Σxy) sums over the per-order derived metrics. */
  private def momentsOf(lineitem: DataFrame): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    val per = lineitem
      .withColumn("hd", expr("CAST(floor(l_extendedprice) AS BIGINT) div 100"))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("ni"), sum($"hd").as("tot"), max($"hd").as("mx"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    per.agg(
      count(lit(1)).as("n"),
      sum(d($"ni")).as("s1"), sum(d($"ni" * $"ni")).as("q1"),
      sum(d($"tot")).as("s2"), sum(d($"tot" * $"tot")).as("q2"),
      sum(d($"mx")).as("s3"), sum(d($"mx" * $"mx")).as("q3"),
      sum(d($"ni" * $"tot")).as("x12"),
      sum(d($"ni" * $"mx")).as("x13"),
      sum(d($"tot" * $"mx")).as("x23"))
  }

  def corrMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = momentsOf(Tables.table(s, dir, "lineitem"))
    val rows = Pairs.map { case (vx, vy, xy, sx, qx, sy, qy) =>
      val cov = s"(n * $xy - $sx * $sy)"
      // cov_num leaves Decimal(38) for the long output column; past ~sf100
      // the n²-scaled covariance can exceed int64, where a bare cast would
      // return silent NULL (ANSI off) while DuckDB's HUGEINT→BIGINT cast
      // errors loudly — guard so both engines fail identically (r9 ADVICE):
      // out-of-range aborts with a unit-coarsening message instead.
      val covLong = s"CASE WHEN abs($cov) < CAST(4611686018427387904 AS DECIMAL(38,0))" +
        s" THEN CAST($cov AS BIGINT)" +
        s" ELSE CAST(raise_error('q_stats_corr cov_num exceeds int64 — " +
        s"coarsen the hectodollar unit') AS BIGINT) END"
      struct(lit(vx).as("var_x"), lit(vy).as("var_y"), col("n").as("n"),
        expr(covLong).as("cov_num"),
        expr(s"CAST((abs($cov) * abs($cov)) div (n * $qx - $sx * $sx)" +
          s" AS DECIMAL(38,0)) * 10000 div (n * $qy - $sy * $sy)")
          .as("corr2_bp"),
        expr(s"CAST(CASE WHEN $cov < 0 THEN -1 ELSE 1 END AS INT)")
          .as("corr_sign"))
    }
    g.select(explode(array(rows: _*)).as("r")).select($"r.*")
      .orderBy($"var_x", $"var_y")
  }

  /** OLS LINEAR REGRESSION (y on x) through the same moment identities —
    * slope = cov_num div var_x_num in exact integer MICRO-units,
    * sign-separated (negative quotients are the one place Spark's
    * truncate and DuckDB's floor disagree, so magnitude and sign travel
    * apart), plus the micro means from which a reader derives the
    * intercept (mean_y − slope·mean_x). Rides the identical one-pass
    * moment aggregate; predicting order total from item count is the fit
    * that matters on this corpus (the slope IS the average item value in
    * hectodollars). */
  def regress(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = momentsOf(Tables.table(s, dir, "lineitem"))
    val rows = Pairs.map { case (vx, vy, xy, sx, qx, sy, _) =>
      val cov = s"(n * $xy - $sx * $sy)"
      struct(lit(vx).as("var_x"), lit(vy).as("var_y"), col("n").as("n"),
        expr(s"CAST(abs($cov) AS DECIMAL(38,0)) * 1000000" +
          s" div (n * $qx - $sx * $sx)").as("slope_micro_abs"),
        expr(s"CAST(CASE WHEN $cov < 0 THEN -1 ELSE 1 END AS INT)")
          .as("slope_sign"),
        expr(s"$sx * 1000000 div n").as("mean_x_micro"),
        expr(s"$sy * 1000000 div n").as("mean_y_micro"))
    }
    g.select(explode(array(rows: _*)).as("r")).select($"r.*")
      .orderBy($"var_x", $"var_y")
  }

  /** A/B EXPERIMENT ANALYSIS — the two-sample comparison the
    * deterministic split machinery exists to feed: users assigned to
    * variants by the salted hash (USER-level, the correct randomization
    * unit — event-level assignment double-counts heavy users), per-user
    * conversion = any purchase, and the 2×2 independence test as an
    * EXACT INTEGER Pearson χ²:
    *
    *   χ²·10⁶ = n·(a·d − b·c)²·10⁶ div ((a+b)(c+d)(a+c)(b+d))
    *
    * — the squared numerator is non-negative (the one div regime both
    * engines agree on), everything stays inside Decimal(38)/HUGEINT at
    * any realistic user count, and there is no float anywhere, so the
    * test statistic itself is oracle-hash-exact (χ²_micro ≥ 3 841 459 ⇔
    * p < 0.05 at 1 dof — the threshold is the reader's constant, not a
    * baked verdict).
    *
    * Shape at scale: one map-side-combinable per-user aggregate
    * (variant is a pure hash projection, conversion a max), one 1-row
    * 2×2 count, one narrow projection. */
  /** Heavy-buyer outcome threshold for [[abChi2]] (≥ this many purchase
    * events): splits users near the median at every SF — an
    * every-user-converts outcome zeroes a margin and the test is
    * undefined (the guard below returns 0 then). */
  val AbConvMin = 14L

  def abChi2(s: SparkSession, dir: String): DataFrame =
    abChi2Of(Tables.events(s, dir))

  /** [[abChi2]] over any `(user_id, event_type)` events table — fixture
    * entry point. */
  private[graft] def abChi2Of(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val users = events
      .select($"user_id", $"event_type")
      .groupBy($"user_id")
      .agg(when(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        >= AbConvMin, 1L).otherwise(0L).as("conv"))
      .withColumn("variant", graft.pipeline.Hashing.charFoldHash(
        concat(lit("ab:"), $"user_id".cast("string"))) % 2)
    val g = users.agg(
      sum(when($"variant" === 0 && $"conv" === 1, 1L).otherwise(0L))
        .cast("decimal(38,0)").as("a"),
      sum(when($"variant" === 0 && $"conv" === 0, 1L).otherwise(0L))
        .cast("decimal(38,0)").as("b"),
      sum(when($"variant" === 1 && $"conv" === 1, 1L).otherwise(0L))
        .cast("decimal(38,0)").as("c"),
      sum(when($"variant" === 1 && $"conv" === 0, 1L).otherwise(0L))
        .cast("decimal(38,0)").as("d"))
    g.select(
      expr("CAST(a + b AS BIGINT)").as("n_a"),
      expr("CAST(c + d AS BIGINT)").as("n_b"),
      expr("CAST(a AS BIGINT)").as("conv_a"),
      expr("CAST(c AS BIGINT)").as("conv_b"),
      expr("a * 10000 div (a + b)").as("rate_a_bp"),
      expr("c * 10000 div (c + d)").as("rate_b_bp"),
      expr("CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0" +
        " ELSE (a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000000" +
        " div ((a + b) * (c + d) * (a + c) * (b + d)) END").as("chi2_micro"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_corr" -> corrMoments _,
    "q_stats_regress" -> regress _,
    "q_stats_ab_chi2" -> abChi2 _,
  )

  val oracles: Map[String, String] = Map(
    // HUGEINT moment arithmetic with the identical division order
    "q_stats_corr" -> {
      val pairRows = Pairs.map { case (vx, vy, xy, sx, qx, sy, qy) =>
        val cov = s"(n * $xy - $sx * $sy)"
        s"""SELECT '$vx' AS var_x, '$vy' AS var_y, n,
           |  CAST($cov AS BIGINT) AS cov_num,
           |  CAST((abs($cov) * abs($cov)) // (n * $qx - $sx * $sx)
           |      * 10000 // (n * $qy - $sy * $sy) AS BIGINT) AS corr2_bp,
           |  CAST(CASE WHEN $cov < 0 THEN -1 ELSE 1 END AS INT) AS corr_sign
           |FROM g""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH per AS (SELECT l_orderkey, count(*) AS ni,
         |    sum(CAST(floor(l_extendedprice) AS BIGINT) // 100) AS tot,
         |    max(CAST(floor(l_extendedprice) AS BIGINT) // 100) AS mx
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(ni) AS s1, sum(ni * ni) AS q1,
         |    sum(tot) AS s2, sum(tot * tot) AS q2,
         |    sum(mx) AS s3, sum(mx * mx) AS q3,
         |    sum(ni * tot) AS x12, sum(ni * mx) AS x13,
         |    sum(tot * mx) AS x23
         |  FROM per)
         |SELECT var_x, var_y, n, cov_num, corr2_bp, corr_sign FROM (
         |$pairRows)
         |ORDER BY var_x, var_y""".stripMargin
    },
    // per-user conversion, polynomial-hash variant assignment, HUGEINT χ²
    "q_stats_ab_chi2" -> {
      val vh = graft.pipeline.Hashing.duckCharFold("'ab:' || CAST(user_id AS VARCHAR)")
      s"""WITH u AS (SELECT user_id,
         |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      >= $AbConvMin THEN 1 ELSE 0 END AS conv
         |  FROM events GROUP BY 1),
         |v AS (SELECT conv, $vh % 2 AS variant FROM u),
         |g AS (SELECT
         |    sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS a,
         |    sum(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS b,
         |    sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS c,
         |    sum(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS d
         |  FROM v)
         |SELECT CAST(a + b AS BIGINT) AS n_a, CAST(c + d AS BIGINT) AS n_b,
         |  CAST(a AS BIGINT) AS conv_a, CAST(c AS BIGINT) AS conv_b,
         |  CAST(a * 10000 // (a + b) AS BIGINT) AS rate_a_bp,
         |  CAST(c * 10000 // (c + d) AS BIGINT) AS rate_b_bp,
         |  CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
         |    ELSE (a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000000
         |      // ((a + b) * (c + d) * (a + c) * (b + d)) END AS BIGINT)
         |    AS chi2_micro
         |FROM g""".stripMargin
    },
    "q_stats_regress" -> {
      val pairRows = Pairs.map { case (vx, vy, xy, sx, qx, sy, _) =>
        val cov = s"(n * $xy - $sx * $sy)"
        s"""SELECT '$vx' AS var_x, '$vy' AS var_y, n,
           |  CAST(abs($cov) * 1000000 // (n * $qx - $sx * $sx) AS BIGINT)
           |    AS slope_micro_abs,
           |  CAST(CASE WHEN $cov < 0 THEN -1 ELSE 1 END AS INT)
           |    AS slope_sign,
           |  CAST($sx * 1000000 // n AS BIGINT) AS mean_x_micro,
           |  CAST($sy * 1000000 // n AS BIGINT) AS mean_y_micro
           |FROM g""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH per AS (SELECT l_orderkey, count(*) AS ni,
         |    sum(CAST(floor(l_extendedprice) AS BIGINT) // 100) AS tot,
         |    max(CAST(floor(l_extendedprice) AS BIGINT) // 100) AS mx
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(ni) AS s1, sum(ni * ni) AS q1,
         |    sum(tot) AS s2, sum(tot * tot) AS q2,
         |    sum(mx) AS s3, sum(mx * mx) AS q3,
         |    sum(ni * tot) AS x12, sum(ni * mx) AS x13,
         |    sum(tot * mx) AS x23
         |  FROM per)
         |SELECT var_x, var_y, n, slope_micro_abs, slope_sign,
         |  mean_x_micro, mean_y_micro FROM (
         |$pairRows)
         |ORDER BY var_x, var_y""".stripMargin
    },
  )
}
