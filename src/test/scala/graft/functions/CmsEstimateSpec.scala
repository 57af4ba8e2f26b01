package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CmsEstimate: probe of a `count_min_sketch`-built sketch. The count-min
  * guarantee is one-sided — estimates NEVER undercount — and that is the
  * property the heavy-hitters gate relies on, so it is what these tests pin
  * (plus exactness when the sketch is wide enough to be collision-free).
  */
class CmsEstimateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words =
    Seq.tabulate(500)(i => s"w${i % 23}") ++ Seq.fill(40)("hot")

  test("estimates never undercount, and match exactly at ample width") {
    val df = words.toDF("w")
    val cms = df.agg(
      count_min_sketch($"w", lit(0.0001), lit(0.99), lit(7)).as("sk"))
    val est = df
      .withColumn("est", CmsEstimate(ColumnBridge.scalarSubquery(cms), $"w"))
      .groupBy($"w").agg(first($"est").as("est"), count(lit(1)).as("exact"))
      .collect()
    assert(est.length === 24)
    est.foreach { r =>
      val (e, x) = (r.getLong(1), r.getLong(2))
      assert(e >= x, s"undercount for ${r.getString(0)}: est $e < exact $x")
    }
    // width 2/0.0001 = 20k cells per row ≫ 24 distinct keys: no collisions
    est.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("null keys estimate to null; works from a literal sketch too") {
    val sketchBytes = {
      val sk = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 7)
      words.foreach(w => sk.addBinary(w.getBytes("UTF-8")))
      sk.toByteArray
    }
    val out = Seq(Some("hot"), None).toDF("w")
      .select(CmsEstimate(lit(sketchBytes), $"w").as("est"))
      .collect()
    assert(out(0).getLong(0) >= 40L)
    assert(out(1).isNullAt(0))
  }

  test("agg-built sketch and hand-built sketch agree (same byte feed)") {
    val df = words.toDF("w")
    val aggBytes = df
      .agg(count_min_sketch($"w", lit(0.001), lit(0.99), lit(7)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val hand = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 7)
    words.foreach(w => hand.addBinary(w.getBytes("UTF-8")))
    val fromAgg = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(aggBytes))
    Seq("w0", "w11", "hot", "absent").foreach { k =>
      assert(fromAgg.estimateCount(k.getBytes("UTF-8")) ===
        hand.estimateCount(k.getBytes("UTF-8")))
    }
  }
}
