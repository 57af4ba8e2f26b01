package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer moment statistics: the whole pipeline re-derived driver-side in
  * BigInt (no precision cap at all) must reproduce every emitted value,
  * and Cauchy–Schwarz bounds the corr² output structurally.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("moments match an exact BigInt recount; corr2 within [0, 10000]") {
    import spark.implicits._
    val rows = graft.sources.Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
      .as[(Long, Double)].collect()
    val per = rows.groupBy(_._1).map { case (_, vs) =>
      val hd = vs.map(v => math.floor(v._2).toLong / 100)
      (BigInt(vs.size), BigInt(hd.sum), BigInt(hd.max))
    }.toVector
    val n = BigInt(per.size)
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = per.map(f).sum
    val (s1, q1) = (s(_._1), s(t => t._1 * t._1))
    val (s2, q2) = (s(_._2), s(t => t._2 * t._2))
    val (s3, q3) = (s(_._3), s(t => t._3 * t._3))
    val x12 = s(t => t._1 * t._2)
    val x13 = s(t => t._1 * t._3)
    val x23 = s(t => t._2 * t._3)
    def pair(xy: BigInt, sx: BigInt, qx: BigInt, sy: BigInt, qy: BigInt) = {
      val cov = n * xy - sx * sy
      val c2 = (cov.abs * cov.abs / (n * qx - sx * sx)) * 10000 /
        (n * qy - sy * sy)
      (cov.toLong, c2.toLong, if (cov < 0) -1 else 1)
    }
    val exp = Map(
      ("max_item_husd", "total_husd") -> pair(x23, s3, q3, s2, q2),
      ("n_items", "max_item_husd") -> pair(x13, s1, q1, s3, q3),
      ("n_items", "total_husd") -> pair(x12, s1, q1, s2, q2))
    val got = Stats.corrMoments(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(got == exp, s"got $got\nexp $exp")
    // Cauchy–Schwarz: corr² can never exceed 1
    assert(got.values.forall(v => v._2 >= 0 && v._2 <= 10000))
    // the derived metrics are genuinely correlated on this corpus
    assert(got(("n_items", "total_husd"))._2 > 3000)

    // regression from the same moments: slope recount + intercept algebra
    def slope(xy: BigInt, sx: BigInt, qx: BigInt, sy: BigInt) = {
      val cov = n * xy - sx * sy
      (cov.abs * 1000000 / (n * qx - sx * sx)).toLong
    }
    val reg = Stats.regress(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getInt(4), r.getLong(5), r.getLong(6))).toMap
    assert(reg(("n_items", "total_husd"))._1 == slope(x12, s1, q1, s2))
    assert(reg(("max_item_husd", "total_husd"))._1 == slope(x23, s3, q3, s2))
    // micro means reproduce exactly
    assert(reg(("n_items", "total_husd"))._3 == (s1 * 1000000 / n).toLong)
    assert(reg(("n_items", "total_husd"))._4 == (s2 * 1000000 / n).toLong)
    // slope(total on items) ≈ the mean item value: predictions through the
    // means are consistent (intercept = mean_y − slope·mean_x is finite
    // and the fitted line passes near the mass center by construction)
    assert(reg.values.forall(_._2 == 1)) // all-positive covariances here
  }

  /** χ²_micro at the p=0.05 line for 1 dof. */
  private val Sig05Micro = 3841459L

  test("A/B chi2: hash split of one population is an A/A null") {
    val r = Stats.abChi2(spark, sf).collect().head
    // both variants populated, conversions present on both sides
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getLong(2) > 0 && r.getLong(3) > 0)
    // a deterministic hash split of identical users must NOT read as a
    // treatment effect
    assert(r.getLong(6) < Sig05Micro, s"A/A chi2 ${r.getLong(6)}")
  }

  test("A/B chi2: a planted real effect crosses the significance line") {
    import spark.implicits._
    // 400 users; variant = charFold('ab:'||id) % 2 (the production
    // assignment); conversion = >= AbConvMin purchases. Plant the effect
    // THROUGH the outcome: users in variant 1 get the purchases.
    val rows = (0L until 400L).flatMap { uid =>
      // recompute the assignment the operator will derive
      val h = ("ab:" + uid).foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 9007199254740881L)
      val conv = (h % 2 == 1) ^ (uid % 10 == 0) // variant 1 converts, 10% noise
      val n = if (conv) Stats.AbConvMin else 1L
      (1L to n).map(i => (uid, "purchase"))
    }
    val r = Stats.abChi2Of(rows.toDF("user_id", "event_type")).collect().head
    assert(r.getLong(6) > Sig05Micro, s"planted effect chi2 ${r.getLong(6)}")
    // rates differ in the planted direction
    assert(math.abs(r.getLong(4) - r.getLong(5)) > 5000)
  }
}
