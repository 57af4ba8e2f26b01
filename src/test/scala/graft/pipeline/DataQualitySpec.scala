package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixture tests for the data-quality suite: every planted violation class
  * moves exactly its own metric/constraint, a clean table passes every
  * gate, and the verdict arithmetic (integer basis points vs threshold) is
  * pinned on hand-computable counts.
  */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  /** (okey, ckey, status, price, odate, priority) — the dirty-registry
    * column set [[DataQuality.dirtyOrdersOf]] produces. */
  private def tbl(rows: Seq[(Long, Long, String, Double, Timestamp, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("okey", "ckey", "status", "price", "odate", "priority")
      .repartition(4)
  }

  private def custKeys(ks: Long*): DataFrame = {
    import spark.implicits._
    ks.toDF("c_custkey")
  }

  private val d0 = ts("1995-06-01")

  test("clean table: every constraint PASSES at 10000 bp") {
    val clean = tbl(Seq(
      (1L, 10L, "O", 5.0, d0, "1-URGENT"),
      (2L, 11L, "F", 6.0, d0, "5-LOW"),
      (3L, 10L, "P", 7.0, d0, "3-MEDIUM")))
    val v = DataQuality.verdictOf(clean, custKeys(10L, 11L)).collect()
    assert(v.length == 6)
    assert(v.forall(_.getString(3) == "PASS"))
    assert(v.forall(_.getLong(1) == 10000L))
  }

  test("each violation class moves exactly its own constraint") {
    // 10 rows; one violation of each class, each in a DIFFERENT row so the
    // per-constraint measured_bp is exactly 9000.
    val rows = Seq(
      (1L, 10L, "X", 5.0, d0, "1-URGENT"),            // bad status
      (2L, 10L, "O", -5.0, d0, "1-URGENT"),            // negative price
      (3L, 99L, "O", 5.0, d0, "1-URGENT"),             // dangling ckey
      (4L, 10L, "O", 5.0, ts("2030-01-01"), "1-URGENT"), // stale date
      (5L, 10L, "O", 5.0, d0, null),                   // missing priority
      (5L, 10L, "O", 5.0, d0, "1-URGENT"),             // duplicate okey
      (6L, 10L, "O", 5.0, d0, "1-URGENT"),
      (7L, 10L, "O", 5.0, d0, "1-URGENT"),
      (8L, 10L, "O", 5.0, d0, "1-URGENT"),
      (9L, 10L, "O", 5.0, d0, "1-URGENT"))
    val v = DataQuality.verdictOf(tbl(rows), custKeys(10L))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(v("accepted_values_status") == ((9000L, "FAIL")))
    assert(v("non_negative_price") == ((9000L, "FAIL")))
    assert(v("referential_custkey") == ((9000L, "FAIL")))
    assert(v("freshness_orderdate") == ((9000L, "FAIL")))
    assert(v("completeness_priority") == ((9000L, "FAIL")))
    assert(v("uniqueness_orderkey") == ((9000L, "FAIL")))
  }

  test("metrics: null/distinct/min/max per column on a hand-computed table") {
    val rows = Seq(
      (3L, 20L, "O", 1.25, d0, "1-URGENT"),
      (1L, 10L, "F", -2.5, d0, null),
      (2L, 10L, "O", 10.0, d0, "5-LOW"))
    val m = DataQuality.metricsOf(tbl(rows)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(m("okey") == ((3L, 0L, 3L, "1", "3")))
    assert(m("ckey") == ((3L, 0L, 2L, "10", "20")))
    assert(m("status") == ((3L, 0L, 2L, "F", "O")))
    // cents: floor(x*100 + 0.5) → 125, -250, 1000
    assert(m("price_cents") == ((3L, 0L, 3L, "-250", "1000")))
    assert(m("priority") == ((3L, 1L, 2L, "1-URGENT", "5-LOW")))
  }

  test("declared corruption classes are all detected on the real table") {
    val v = DataQuality.verdict(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // the planted rates vs thresholds: completeness and RI gates fail,
    // the rest pass — the suite demonstrably detects AND tolerates
    assert(v("completeness_priority") == "FAIL")
    assert(v("referential_custkey") == "FAIL")
    assert(v("uniqueness_orderkey") == "PASS")
    assert(v("accepted_values_status") == "PASS")
    assert(v("non_negative_price") == "PASS")
    assert(v("freshness_orderdate") == "PASS")
  }

  test("per-partition trend: month buckets isolate a localized violation") {
    // 6 rows over two months; the bad status and the negative price both
    // sit in Feb — Jan must read clean 10000s, Feb 5000/10000/5000
    val rows = Seq(
      (1L, 10L, "O", 5.0, ts("1995-01-05"), "1-URGENT"),
      (2L, 10L, "F", 6.0, ts("1995-01-20"), "5-LOW"),
      (3L, 10L, "P", 7.0, ts("1995-01-25"), "3-MEDIUM"),
      (4L, 10L, "X", 5.0, ts("1995-02-01"), "1-URGENT"),
      (5L, 10L, "O", -5.0, ts("1995-02-10"), null),
      (6L, 10L, "O", 5.0, ts("1995-02-20"), "1-URGENT"))
    val got = DataQuality.byPartitionOf(tbl(rows)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(199501) == ((3L, 10000L, 10000L, 10000L)))
    assert(got(199502) == ((3L, 6666L, 6666L, 6666L)))
  }

  test("triage examples: one row per planted violation, named and bounded") {
    val rows = Seq(
      (1L, 10L, "X", 5.0, d0, "1-URGENT"),
      (2L, 10L, "O", -5.0, d0, "1-URGENT"),
      (3L, 99L, "O", 5.0, d0, "1-URGENT"),
      (4L, 10L, "O", 5.0, d0, null),
      (5L, 10L, "O", 5.0, d0, "1-URGENT"))
    val got = DataQuality.examplesOf(tbl(rows), custKeys(10L)).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
    assert(got.toSeq == Seq(
      ("accepted_values_status", 1L, Some("X")),
      ("completeness_priority", 4L, None),
      ("non_negative_price", 2L, Some("-500")),
      ("referential_custkey", 3L, Some("99"))), got.toSeq.toString)
  }

  test("triage examples: caps at ExamplesPerCheck, smallest keys win") {
    val rows = (1L to 40L).map(i => (i, 10L, "X", 5.0, d0, "1-URGENT"))
    val got = DataQuality.examplesOf(tbl(rows), custKeys(10L)).collect()
    assert(got.length == DataQuality.ExamplesPerCheck)
    assert(got.map(_.getLong(1)).toSeq == (1L to 10L))
  }

  test("cross-table audit: each violation class moves exactly its own rate") {
    import spark.implicits._
    // 4 orders: #1 consistent (2 lines summing to the stored total, both
    // shipping after), #2 has a ship-date inversion, #3's stored total is
    // off by >1%, #4 is childless; plus one ORPHAN lineitem (key 99)
    val orders = Seq(
      (1L, ts("1995-01-01"), 30.0),
      (2L, ts("1995-02-01"), 10.0),
      (3L, ts("1995-03-01"), 100.0),
      (4L, ts("1995-04-01"), 5.0)
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val li = Seq(
      (1L, ts("1995-01-10"), 10.0, 0.0, 0.0),
      (1L, ts("1995-01-20"), 20.0, 0.0, 0.0),
      (2L, ts("1995-01-15"), 10.0, 0.0, 0.0),  // ships BEFORE order 2
      (3L, ts("1995-03-10"), 50.0, 0.0, 0.0),  // half the stored total
      (99L, ts("1995-05-01"), 1.0, 0.0, 0.0)   // orphan
    ).toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount", "l_tax")
    val got = DataQuality.crossAuditOf(orders, li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("order_has_lineitem") == 7500L)   // 3 of 4
    assert(got("ri_lineitem_order") == 8000L)    // 4 of 5 (orphan)
    assert(got("ship_after_order") == 7500L)     // 3 of 4 matched
    // orders 1 AND 2 are sum-consistent (2's violation is the date, not
    // the total); denominator = the 3 orders WITH lines — childless order
    // 4 is charged only to order_has_lineitem (r9 ADVICE)
    assert(got("total_matches_sum_1pct") == 6666L)
  }

  test("cross-table audit on the real tables: honest rates, RI passes") {
    val v = DataQuality.crossAudit(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(v("ri_lineitem_order") == ((10000L, "PASS")))
    // the driver corpus is TPC-H-ish, not TPC-H: these measured rates are
    // the audit's value — the feed is broken and the audit says so
    assert(v("ship_after_order")._2 == "FAIL")
    assert(v("total_matches_sum_1pct")._2 == "FAIL")
  }

  test("shuffled input: metrics and verdicts are partition-order invariant") {
    val base = DataQuality.dirtyOrdersOf(
      graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "orders"))
    val shuffled = base.repartition(17)
    val a = DataQuality.metricsOf(base).collect().map(_.toString).toSeq
    val b = DataQuality.metricsOf(shuffled).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
