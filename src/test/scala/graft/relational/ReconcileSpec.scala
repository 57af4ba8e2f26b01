package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two-phase bucketed-checksum diff must equal a direct full-outer
  * compare: planted drops / flips / phantoms classify correctly, identical
  * tables diff to empty, and the declared orders audit finds exactly the
  * injected drift classes.
  */
class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def payload(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "cents", "custkey", "status")
  }

  private val src = payload(Seq(
    (1L, 100L, 10L, "O"), (2L, 200L, 20L, "F"), (3L, 300L, 30L, "O"),
    (4L, 400L, 40L, "P"), (5L, 500L, 50L, "O")))

  test("identical tables diff to empty") {
    assert(Reconcile.tableDiff(src, payload(Seq(
      (1L, 100L, 10L, "O"), (2L, 200L, 20L, "F"), (3L, 300L, 30L, "O"),
      (4L, 400L, 40L, "P"), (5L, 500L, 50L, "O")))).count() == 0L)
  }

  test("drops, payload changes, and phantom rows classify correctly") {
    import spark.implicits._
    // replica: 2 dropped, 3 cents-flipped, 4 status-changed, 99 phantom
    val dst = payload(Seq(
      (1L, 100L, 10L, "O"), (3L, 301L, 30L, "O"),
      (4L, 400L, 40L, "X"), (5L, 500L, 50L, "O"), (99L, 9L, 9L, "O")))
    val got = Reconcile.tableDiff(src, dst)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, "missing", 200L, -1L),
      (3L, "changed", 300L, 301L),
      (4L, "changed", 400L, 400L),
      (99L, "extra", -1L, 9L)))
  }

  test("the declared orders audit finds all three injected drift classes") {
    import spark.implicits._
    val got = Reconcile.ordersAudit(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val byVerdict = got.groupBy(_._2)
    // every injected class is visible at sf0.001 (keys 0..1499: drop 7,
    // 1007; flip 3, 1000; phantom source 1)
    assert(byVerdict("missing").map(_._1).toSet == Set(7L, 1007L))
    assert(byVerdict("changed").forall { case (k, _, s, d) =>
      k % Reconcile.FlipMod == Reconcile.FlipRes && d == s + 1 })
    assert(byVerdict("extra").forall(_._1 >= Reconcile.InsShift))
    // and nothing else: the planted drift is the whole diff
    assert(got.size ==
      byVerdict("missing").size + byVerdict("changed").size + byVerdict("extra").size)
  }

  test("repair closure: applying the diff as a fix-up converges the replica") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = Reconcile.ordersPayload(
      graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "orders"))
    val replica = Reconcile.replicaOf(src)
    val diff = Reconcile.tableDiff(src, replica).cache()
    val extras = diff.filter($"verdict" === "extra").select($"k")
    val stale = diff.filter($"verdict".isin("missing", "changed")).select($"k")
    // the diff IS the repair feed: drop extras, then take missing/changed
    // rows from the source of truth
    val repaired = replica
      .join(broadcast(extras), Seq("k"), "left_anti")
      .join(broadcast(stale), Seq("k"), "left_anti")
      .unionByName(src.join(broadcast(stale), Seq("k"), "left_semi"))
    assert(Reconcile.tableDiff(src, repaired).count() == 0L)
  }
}
