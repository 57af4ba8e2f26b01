package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The engine's relational operator inventory (SURVEY.md §2.3): every declared
  * query id, implemented with Spark built-ins only so Catalyst gets full
  * optimization freedom (pushdown, pruning, join selection, AQE).
  *
  * Determinism contract for the DuckDB oracle (FIXTURES.md §B.2): output only
  * integer keys, strings, second-truncated timestamps, or DECIMAL-cast
  * aggregates; total ORDER BY over all output columns; column names identical
  * to the oracle SQL.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column, p: Int = 18, sc: Int = 2): Column = c.cast(DecimalType(p, sc))

  /** Revenue term `price * (1 - discount)` computed in DECIMAL, not double:
    * source money columns are clean 2-decimal values, so casting operands
    * FIRST and multiplying in decimal is exact and engine-agnostic, whereas
    * casting the double product rounds differently in Spark (shortest-string
    * repr, HALF_UP) vs DuckDB (exact binary expansion). The result keeps the
    * natural product scale 4 — NEVER reduce decimal scale in an oracle query:
    * Spark rounds HALF_UP on scale-reducing casts, DuckDB truncates. */
  private def revenue(price: Column, discount: Column): Column =
    dec(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount)), 18, 4)

  // ---------------------------------------------------------------- scans

  /** Parquet scan + pushed filter + arithmetic projection. */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" >= 45.0)
      .select(
        $"l_orderkey", $"l_linenumber",
        dec($"l_quantity").as("qty"),
        revenue($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- aggregation

  /** TPC-H Q1-style grouped aggregation (partial+final hash agg). */
  def aggGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dec(sum(dec($"l_quantity"))).as("sum_qty"),
        dec(sum(dec($"l_extendedprice"))).as("sum_price"),
        dec(min(dec($"l_extendedprice"))).as("min_price"),
        dec(max(dec($"l_extendedprice"))).as("max_price"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---------------------------------------------------------------- joins

  /** Broadcast equi-join over the two smallest dims. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region")
    nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name", $"r_name")
      .orderBy($"n_nationkey")
  }

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter_project" -> scanFilterProject _,
    "q_agg_group" -> aggGroup _,
    "q_join_broadcast" -> joinBroadcast _,
  ) ++ Joins.queries ++ Aggregates.queries ++ Windows.queries ++
    SetOps.queries ++ Funcs.queries ++ Funcs2.queries ++
    Subqueries.queries ++ TimeWindows.queries ++ TextSim.queries

  val oracles: Map[String, String] = Map(
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem WHERE l_quantity >= 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
        |  CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS min_price,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS max_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
  ) ++ Joins.oracles ++ Aggregates.oracles ++ Windows.oracles ++
    SetOps.oracles ++ Funcs.oracles ++ Funcs2.oracles ++
    Subqueries.oracles ++ TimeWindows.oracles ++ TextSim.oracles
}
