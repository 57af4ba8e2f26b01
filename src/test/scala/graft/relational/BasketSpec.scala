package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Market-basket pair mining on planted orders: support counts, the
  * min-support gate, duplicate-lineitem collapse, and the per-part order
  * frequencies that feed confidence/lift.
  */
class BasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pair support, dedup within order, min-support gate, frequencies") {
    import spark.implicits._
    // orders: {A,B,C} ×3, {A,B} ×1 (A,B co-occur 4×; A,C / B,C 3×);
    // {D} alone never pairs; order 100 lists part A TWICE (must collapse)
    val rows =
      (1 to 3).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L), (o.toLong, 3L))) ++
        Seq((100L, 1L), (100L, 2L), (100L, 1L), (200L, 4L))
    val got = Basket.basketPairsOf(rows.toDF("l_orderkey", "l_partkey"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 4L, 4L, 4L),
      (1L, 3L, 3L, 4L, 3L),
      (2L, 3L, 3L, 4L, 3L)), got.toString)
  }

  test("min support prunes singleton co-occurrences") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (1L, 11L)) // one co-occurrence only
    val got = Basket.basketPairsOf(rows.toDF("l_orderkey", "l_partkey")).count()
    assert(got == 0L)
  }
}
