package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.relational.Queries.cents

/** Window-function inventory (ranking / analytic / frames) + order-sensitive
  * shapes (global top-k, per-group top-k). Every window ORDER BY carries a
  * unique tiebreak column so ranks are deterministic across engines; money
  * is quantized to integer cents per-row before any window aggregate or
  * output — never DECIMAL, never raw doubles (oracle determinism contract,
  * see [[Queries.cents]]).
  */
object Windows {

  /** rank / dense_rank / row_number / ntile per mktsegment by acctbal. */
  def rank_(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.table(s, dir, "customer")
      .select(
        $"c_mktsegment", $"c_custkey",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("nt"))
      .orderBy($"c_mktsegment", $"rn")
  }

  /** lag / lead / first_value over per-customer order history. Nulls at
    * partition edges are coalesced to -1 so the output column stays int64
    * on both engines (nullable int64 → float64 in pandas is another
    * representation hazard class). */
  def analytic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.table(s, dir, "orders")
      .withColumn("pc", cents($"o_totalprice"))
      .select(
        $"o_custkey", $"o_orderkey",
        coalesce(lag($"pc", 1).over(w), lit(-1L)).as("prev_cents"),
        coalesce(lead($"pc", 1).over(w), lit(-1L)).as("next_cents"),
        first($"o_orderkey").over(w).as("first_key"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Running sum with an explicit ROWS frame — cents quantized per-row
    * before the frame sum, so the running total is an exact integer fold. */
  def frame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(s, dir, "orders")
      .withColumn("pc", cents($"o_totalprice"))
      .select(
        $"o_custkey", $"o_orderkey",
        sum($"pc").over(w).as("running_cents"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** VALUE-range frame (`RANGE BETWEEN 30 PRECEDING AND CURRENT ROW`):
    * trailing-30-day spend per customer. The order key is day-number (a
    * numeric column — Spark range frames require one); RANGE includes
    * same-day peers on both engines and the SUM over a value range is
    * order-independent, so no tiebreak is needed for determinism. */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"d")
      .rangeBetween(-30, Window.currentRow)
    Tables.table(s, dir, "orders")
      .withColumn("d", datediff($"o_orderdate", lit("1990-01-01")).cast("long"))
      .withColumn("pc", cents($"o_totalprice"))
      .select(
        $"o_custkey", $"o_orderkey",
        sum($"pc").over(w).as("trailing30_cents"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Global top-100 (TakeOrderedAndProject — no full sort at scale). */
  def sortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", cents($"l_extendedprice").as("price_cents"))
      .orderBy($"price_cents".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** Per-group top-k via row_number (the scalable per-key top-k shape). */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rank" -> rank_ _,
    "q_window_analytic" -> analytic _,
    "q_window_frame" -> frame _,
    "q_window_range_frame" -> rangeFrame _,
    "q_sort_limit" -> sortLimit _,
    "q_topk_per_group" -> topkPerGroup _,
  )

  val oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  row_number() OVER w AS rn, ntile(4) OVER w AS nt
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(coalesce(lag(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT), 1) OVER w, -1) AS BIGINT) AS prev_cents,
        |  CAST(coalesce(lead(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT), 1) OVER w, -1) AS BIGINT) AS next_cents,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing30_cents
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        |FROM lineitem
        |ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
  )
}
