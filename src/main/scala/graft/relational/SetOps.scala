package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Set-operation inventory over customer-key slices (multiples of 3 vs 5):
  * UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.
  */
object SetOps {

  private def slice(s: SparkSession, dir: String, m: Int): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "customer").select($"c_custkey").filter($"c_custkey" % m === 0)
  }

  def unionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slice(s, dir, 3).unionAll(slice(s, dir, 5)).orderBy($"c_custkey")
  }

  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slice(s, dir, 3).union(slice(s, dir, 5)).distinct().orderBy($"c_custkey")
  }

  def intersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slice(s, dir, 3).intersect(slice(s, dir, 5)).orderBy($"c_custkey")
  }

  def except(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slice(s, dir, 3).except(slice(s, dir, 5)).orderBy($"c_custkey")
  }

  /** Multiset variants: duplicates preserved per bag semantics. The inputs
    * are made multisets by unioning a slice with itself. */
  def intersectAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = slice(s, dir, 3)
    a.unionAll(a).intersectAll(slice(s, dir, 5).unionAll(slice(s, dir, 15)))
      .orderBy($"c_custkey")
  }

  def exceptAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = slice(s, dir, 3)
    a.unionAll(a).exceptAll(slice(s, dir, 3))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set_union_all" -> unionAll _,
    "q_set_union_distinct" -> unionDistinct _,
    "q_set_intersect" -> intersect _,
    "q_set_except" -> except _,
    "q_set_intersect_all" -> intersectAll _,
    "q_set_except_all" -> exceptAll _,
  )

  val oracles: Map[String, String] = Map(
    "q_set_union_all" ->
      """SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q_set_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |UNION SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |INTERSECT SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |EXCEPT SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q_set_intersect_all" ->
      """(SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        | UNION ALL SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
        |INTERSECT ALL
        |(SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        | UNION ALL SELECT c_custkey FROM customer WHERE c_custkey % 15 = 0)
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except_all" ->
      """(SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        | UNION ALL SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
        |EXCEPT ALL
        |SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        |ORDER BY c_custkey""".stripMargin,
  )
}
