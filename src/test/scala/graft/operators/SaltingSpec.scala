package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted join must be result-equivalent to the plain equi-join and
  * partition on (key, salt) — the hot key spreads across `salts` reducers.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join == plain join on orders ⋈ customer") {
    val orders = graft.sources.Tables.table(spark, sf, "orders")
    val customer = graft.sources.Tables.table(spark, sf, "customer")

    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Salting.saltedJoin(orders, customer, "o_custkey", "c_custkey",
        saltSource = col("o_orderkey"), salts = 8)
      .select("o_orderkey", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salted join shuffles on (key, salt)") {
    val orders = graft.sources.Tables.table(spark, sf, "orders")
    val customer = graft.sources.Tables.table(spark, sf, "customer")
    val df = Salting.saltedJoin(orders, customer, "o_custkey", "c_custkey",
      saltSource = col("o_orderkey"), salts = 8)
    // force a shuffle-based strategy so the partitioning is visible
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("__salt"), p)
  }
}
