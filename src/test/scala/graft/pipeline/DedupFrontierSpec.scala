package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The MinHash threshold-sensitivity frontier: structural invariants on
  * the real corpus plus consistency with the shipped ≥ 4 operating point
  * (the frontier's row 4 must count exactly the pairs `minhashPairs`
  * ships — the sweep measures the production criterion, not a replica).
  */
class DedupFrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("frontier: monotone in threshold, full range, row 4 == shipped pairs") {
    val rows = Dedup.thresholdFrontier(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to 8))
    // both curves are non-increasing in the threshold
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3, s"$a !>= $b")
    }
    // pairs at a threshold of 1 = every candidate pair sharing >= 1 band
    assert(rows.head._2 > 0)
    // the shipped operating point: frontier row 4 counts exactly the
    // pairs the production criterion emits
    val shipped = Dedup.minhashPairs(spark,
      graft.sources.Tables.table(spark, sf, "documents")).count()
    assert(rows(3)._2 == shipped, s"frontier ${rows(3)._2} != shipped $shipped")
    // docs covered never exceeds 2 pairs' worth of endpoints
    rows.foreach { case (_, np, ndoc) => assert(ndoc <= 2 * np) }
  }
}
