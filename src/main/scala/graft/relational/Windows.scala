package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Window-function inventory (ranking / analytic / frames) + order-sensitive
  * shapes (global top-k, per-group top-k). Every window ORDER BY carries a
  * unique tiebreak column so ranks are deterministic across engines; doubles
  * are used for ordering only, never output raw.
  */
object Windows {

  private val dec2 = DecimalType(18, 2)

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

  /** lag / lead / first_value over per-customer order history. */
  def analytic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.table(s, dir, "orders")
      .select(
        $"o_custkey", $"o_orderkey",
        lag($"o_totalprice", 1).over(w).cast(dec2).as("prev_price"),
        lead($"o_totalprice", 1).over(w).cast(dec2).as("next_price"),
        first($"o_orderkey").over(w).as("first_key"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Running sum with an explicit ROWS frame. */
  def frame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(s, dir, "orders")
      .select(
        $"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast(dec2)).over(w).cast(dec2).as("running"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Global top-100 (TakeOrderedAndProject — no full sort at scale). */
  def sortLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice".cast(dec2).as("price"))
      .orderBy($"price".desc, $"l_orderkey", $"l_linenumber")
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
        |  CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(18,2)) AS prev_price,
        |  CAST(lead(o_totalprice, 1) OVER w AS DECIMAL(18,2)) AS next_price,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
  )
}
