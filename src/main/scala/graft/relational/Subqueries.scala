package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Subquery surface, exercised through SQL text so Catalyst's rewrite rules
  * (RewriteCorrelatedScalarSubquery, decorrelation to joins) do the work —
  * SURVEY.md §4.2 lists these as free; these queries prove it. Correlated
  * comparisons use exact aggregates (max/count), never averaged doubles.
  */
object Subqueries {

  private def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("orders", "customer", "lineitem").foreach { t =>
      Tables.table(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(sql)
  }

  /** Correlated scalar subquery: each customer's most expensive order. */
  def scalar(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir)(
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)

  /** Correlated EXISTS: orders containing a max-quantity lineitem. */
  def existsCorrelated(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir)(
      """SELECT o_orderkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
        |ORDER BY o_orderkey""".stripMargin)

  /** Uncorrelated IN subquery (rewritten to a semi join). */
  def inSubquery(s: SparkSession, dir: String): DataFrame =
    withViews(s, dir)(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_subquery_scalar" -> scalar _,
    "q_subquery_exists" -> existsCorrelated _,
    "q_subquery_in" -> inSubquery _,
  )

  val oracles: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_exists" ->
      """SELECT o_orderkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
  )
}
