package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The engine's relational operator inventory (SURVEY.md §2.3): every declared
  * query id, implemented with Spark built-ins only so Catalyst gets full
  * optimization freedom (pushdown, pruning, join selection, AQE).
  *
  * Determinism contract for the DuckDB oracle (FIXTURES.md §B.2): output only
  * integer keys, strings, second-truncated timestamps, or integer-quantized
  * money (cents/micros) — NEVER a DECIMAL or raw-double column (round-1
  * driver gate: every DECIMAL output column hash-mismatched because DuckDB
  * surfaces DECIMAL to pandas as float64 "1.5" while Spark parquet
  * round-trips the exact decimal "1.50"); total ORDER BY over all output
  * columns; column names identical to the oracle SQL.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Quantize a clean-2-decimal money double to integer cents.
    * `floor(x * 100.0 + 0.5)` runs the identical IEEE-754 double ops on both
    * engines, so the BIGINT result hash-matches regardless of each engine's
    * decimal/float printing. The oracle-side spelling is
    * `CAST(floor(col * 100.0 + 0.5) AS BIGINT)`. */
  private[relational] def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(LongType)

  // ---------------------------------------------------------------- scans

  /** Parquet scan + pushed filter + arithmetic projection. Revenue
    * `price * (1 - discount)` is computed entirely in integers:
    * cents(price) * (100 - cents(discount)) = revenue scaled by 10^4 —
    * exact, order-independent, engine-agnostic. */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" >= 45.0)
      .select(
        $"l_orderkey", $"l_linenumber",
        cents($"l_quantity").as("qty_cents"),
        (cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
          .as("revenue_e4"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---------------------------------------------------------------- aggregation

  /** TPC-H Q1-style grouped aggregation (partial+final hash agg). Money is
    * quantized to cents per-row BEFORE the sum so the aggregate is an exact
    * integer fold — order-independent across partitions and engines. */
  def aggGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(cents($"l_quantity")).as("sum_qty_cents"),
        sum(cents($"l_extendedprice")).as("sum_price_cents"),
        min(cents($"l_extendedprice")).as("min_price_cents"),
        max(cents($"l_extendedprice")).as("max_price_cents"),
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
    Subqueries.queries ++ TimeWindows.queries ++ TimeSeries.queries ++
    Skyline.queries ++ Changelog.queries ++ Basket.queries ++ Paths.queries ++
    Stats.queries ++
    TextSim.queries ++ Reconcile.queries

  val oracles: Map[String, String] = Map(
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_cents,
        |  CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem WHERE l_quantity >= 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  min(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS min_price_cents,
        |  max(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS max_price_cents,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
  ) ++ Joins.oracles ++ Aggregates.oracles ++ Windows.oracles ++
    SetOps.oracles ++ Funcs.oracles ++ Funcs2.oracles ++
    Subqueries.oracles ++ TimeWindows.oracles ++ TimeSeries.oracles ++
    Skyline.oracles ++ Changelog.oracles ++ Basket.oracles ++ Paths.oracles ++
    Stats.oracles ++
    TextSim.oracles ++ Reconcile.oracles
}
