package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Non-oracle operators (SURVEY.md §2.3): approximate distinct (HLL++) versus
  * exact within tolerance, and the typed Aggregator (UDAF) surface.
  */
class ApproxAndUdafSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val df = graft.sources.Tables.table(spark, sf, "orders")
    val r = df.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.01).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("GeoMean aggregator: typed per-group aggregation with partial merge") {
    import spark.implicits._
    val vals = spark.createDataset(Seq(("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0)))
    val out = vals.groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.GeoMean.toColumn.name("gm"))
      .collect().toMap
    assert(math.abs(out("a") - 4.0) < 1e-9) // sqrt(2*8)
    assert(math.abs(out("b") - 9.0) < 1e-9) // sqrt(3*27)
  }

  test("GeoMean as an untyped column over a DataFrame") {
    import spark.implicits._
    val df = spark.createDataset(Seq(1.0, 10.0, 100.0)).toDF("v")
    val gm = df.agg(udaf(graft.functions.GeoMean).apply(col("v"))).head().getDouble(0)
    assert(math.abs(gm - 10.0) < 1e-9)
  }
}
