package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Aggregation inventory beyond the basic grouped agg (Queries.aggGroup):
  * distinct aggregation, rollup / cube / grouping sets with explicit
  * `grouping()` flags. Output strings are COALESCE'd (source columns are
  * non-null) because Spark sorts NULLS FIRST and DuckDB NULLS LAST — never
  * let a nullable column into the total ORDER BY of an oracle query.
  */
object Aggregates {

  /** CASE WHEN + IN + BETWEEN predicate surface. */
  def caseWhen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .select(
        $"o_orderkey",
        when($"o_totalprice" > 300000.0, "big")
          .when($"o_totalprice".between(100000.0, 300000.0), "mid")
          .otherwise("small").as("bucket"),
        when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0).as("urgent"))
      .orderBy($"o_orderkey")
  }

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("cnt"))
      .orderBy($"o_orderstatus")
  }

  private def gsetSelect(s: SparkSession, dir: String, grouped: DataFrame): DataFrame = {
    import s.implicits._
    grouped.orderBy($"ga", $"gb", $"status", $"prio")
  }

  private def gsetAgg(df: org.apache.spark.sql.RelationalGroupedDataset) = {
    df.agg(
      grouping(col("o_orderstatus")).as("ga"),
      grouping(col("o_orderpriority")).as("gb"),
      count(lit(1)).as("cnt"))
      .select(
        col("ga"), col("gb"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("cnt"))
  }

  /** ROLLUP(status, priority). */
  def rollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    gsetSelect(s, dir, gsetAgg(o.rollup(col("o_orderstatus"), col("o_orderpriority"))))
  }

  /** CUBE(status, priority). */
  def cube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    gsetSelect(s, dir, gsetAgg(o.cube(col("o_orderstatus"), col("o_orderpriority"))))
  }

  /** Explicit GROUPING SETS ((status), (priority), ()). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    gsetSelect(s, dir, gsetAgg(
      o.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))))
  }

  /** PIVOT: order counts by status × priority, priorities as columns
    * (explicit value list → deterministic schema). */
  def pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.table(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .pivot($"o_orderpriority", prios)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderstatus")
  }

  private val gsetOracle =
    """  grouping(o_orderstatus) AS ga, grouping(o_orderpriority) AS gb,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  count(*) AS cnt
      |FROM orders""".stripMargin

  /** UNPIVOT (wide → long): per-status money + count metrics melted into
    * (status, metric, value) rows via Spark's native `unpivot` (codegen'd
    * Expand under the hood — no shuffle beyond the feeding aggregate). */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(sum(Queries.cents($"o_totalprice")).as("total_cents"),
        count(lit(1)).as("n_orders"))
      .unpivot(Array($"o_orderstatus"), Array($"total_cents", $"n_orders"),
        "metric", "value")
      .orderBy($"o_orderstatus", $"metric")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_case_when" -> caseWhen _,
    "q_agg_distinct" -> aggDistinct _,
    "q_agg_rollup" -> rollup _,
    "q_agg_cube" -> cube _,
    "q_agg_grouping_sets" -> groupingSets _,
    "q_agg_pivot" -> pivot _,
    "q_agg_unpivot" -> unpivotMetrics _,
  )

  val oracles: Map[String, String] = Map(
    // spelled as UNION ALL (not DuckDB's UNPIVOT syntax) so the oracle stays
    // portable ANSI; both metrics are BIGINT so the long `value` column is
    // integer-typed on both engines
    "q_agg_unpivot" ->
      """SELECT o_orderstatus, metric, value FROM (
        |  SELECT o_orderstatus, 'total_cents' AS metric,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT o_orderstatus, 'n_orders' AS metric, CAST(count(*) AS BIGINT) AS value
        |  FROM orders GROUP BY o_orderstatus)
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "q_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |       WHEN o_totalprice BETWEEN 100000.0 AND 300000.0 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio, count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT
         |$gsetOracle
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY ga, gb, status, prio""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT
         |$gsetOracle
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY ga, gb, status, prio""".stripMargin,
    "q_agg_grouping_sets" ->
      s"""SELECT
         |$gsetOracle
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY ga, gb, status, prio""".stripMargin,
    "q_agg_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
