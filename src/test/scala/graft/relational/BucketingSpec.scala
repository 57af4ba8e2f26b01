package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing: writing both join sides bucketed on the join key makes the
  * sort-merge join shuffle-free — the scan's bucket layout satisfies the
  * join's required distribution. This is the at-scale pre-partitioning
  * technique (SURVEY.md: "bucketing for co-located joins") that turns a
  * repeated fact⋈fact join from two 100-TB shuffles into zero.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("join of co-bucketed tables plans no exchange") {
    val li = graft.sources.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog is per-JVM but the warehouse dir persists:
    // stale locations make saveAsTable refuse
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val n = joined.count()
    assert(n == li.count())

    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }
}
