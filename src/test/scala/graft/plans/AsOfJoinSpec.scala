package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom sort-merge as-of join must agree row-for-row with the
  * compose-based baseline (range join + rank — graft.relational.Joins.asOf,
  * itself DuckDB-oracle-checked) and plan exactly one exchange + sort per
  * side with no quadratic intermediate.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def inputs() = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("ts_sec"))
    val orders = graft.sources.Tables.table(spark, sf, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    (ev, orders)
  }

  test("custom operator == compose-based as-of baseline") {
    import spark.implicits._
    val (ev, orders) = inputs()
    val custom = AsOf.join(ev, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTsCol = "ts_sec", rightTsCol = "o_orderdate",
        rightTiebreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseline = graft.relational.Joins.asOf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == baseline)
    assert(custom.nonEmpty)
  }

  test("plan: one exchange per side, merge-scan operator, no quadratic join") {
    val (ev, orders) = inputs()
    val df = AsOf.join(ev, orders, "user_id", "o_custkey", "ts_sec", "o_orderdate",
      Seq("o_orderkey"))
    df.collect()
    // AQE renders Final + Initial plans; count exchanges in the final one only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), p) // exec node renders without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("left rows without a qualifying right row are dropped (inner as-of)") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 5L), (2L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 50L, "x"), (1L, 90L, "y")).toDF("rk", "rts", "v")
    val out = AsOf.join(left, right, "k", "rk", "ts", "rts")
      .select($"k", $"ts", $"v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // (1,100) -> latest rts<=100 is y@90; (1,5) no right <=5; key 2 absent
    assert(out == Set((1L, 100L, "y")))
  }

  test("left-outer as-of pads unmatched left rows with nulls") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 5L), (2L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 50L, "x"), (1L, 90L, "y")).toDF("rk", "rts", "v")
    val out = AsOf.join(left, right, "k", "rk", "ts", "rts", joinType = "left")
      .select($"k", $"ts", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      (1L, 100L, Some("y")),
      (1L, 5L, None),
      (2L, 100L, None)))
  }
}
