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
      struct(lit(vx).as("var_x"), lit(vy).as("var_y"), col("n").as("n"),
        expr(cov).cast("long").as("cov_num"),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_corr" -> corrMoments _,
    "q_stats_regress" -> regress _,
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
