package graft.relational

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the skyline sweep against the O(n²) brute-force
  * dominance filter, over random tables dense enough to exercise
  * cents-ties, bucket boundaries, and the hierarchical carry; plus a
  * direct check of the suffix-min recursion at a tiny fanout.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Brute force: u survives iff nobody has (cents ≥, n ≤) with one strict. */
  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { case (_, a, n) =>
      !rows.exists { case (_, a2, n2) =>
        a2 >= a && n2 <= n && (a2 > a || n2 < n)
      }
    }.toSet

  test("random frontiers match brute force (ties, bucket edges, carries)") {
    import spark.implicits._
    val rnd = new Random(5)
    for (trial <- 1 to 6) {
      // cents span several BucketCents buckets; small value range forces ties
      val rows = (1L to (30 + rnd.nextInt(60)).toLong).map { uid =>
        (uid, (rnd.nextInt(8) * Skyline.BucketCents / 2 + rnd.nextInt(5)),
          1L + rnd.nextInt(6))
      }
      val got = Skyline.frontier2d(
          rows.toDF("user_id", "cents", "n_purchases"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == brute(rows), s"trial $trial")
    }
  }

  test("suffix-min hierarchy at fanout 2 equals the flat scan") {
    import spark.implicits._
    val rnd = new Random(9)
    val buckets = (0L to 40L).map(g => (g, 1L + rnd.nextInt(100)))
    val got = Skyline.suffixMins(buckets.toDF("g", "mn"), levels = 2, fanout = 2)
      .as[(Long, Option[Long])].collect().toMap
    buckets.foreach { case (g, _) =>
      val higher = buckets.filter(_._1 > g).map(_._2)
      val expect = if (higher.isEmpty) None else Some(higher.min)
      assert(got(g) == expect, s"bucket $g")
    }
  }

  test("frontier on the driver events: every member undominated, maxima present") {
    import spark.implicits._
    val agg = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_purchases"))
      .as[(Long, Long, Long)].collect().toSeq
    val got = Skyline.skyline(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(agg))
    // the global max-cents point is always on the frontier
    val maxCents = agg.map(_._2).max
    assert(got.exists(_._2 == maxCents))
  }
}
