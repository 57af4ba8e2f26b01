package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup semantic dedup: the declared query is oracle-gated at sf0.01;
  * here the same answer is recomputed INDEPENDENTLY — collect the k-means
  * cell assignment and redo the within-cell cosine test in driver-side
  * BigInt (no Decimal(38) prescreen, no Spark expressions) — so a bug in
  * the distributed pair join or the 128-bit comparison path can't hide
  * behind a matching oracle translation of the same plan.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("matches a driver-side BigInt brute force over the same cells") {
    import spark.implicits._
    val cells = Similarity.ivfCells(spark, sf)
      .select($"vec_id", $"q", $"cell")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    // brute force: all within-cell ordered pairs, exact BigInt cosine test
    val expected = (for {
      (va, qa, ca) <- cells
      (vb, qb, cb) <- cells
      if ca == cb && va < vb
      dot = qa.lazyZip(qb).map(_ * _).sum
      if dot > 0 &&
        BigInt(dot) * dot * Dedup.SemTauDen >=
          BigInt(qa.map(x => x * x).sum) * qb.map(x => x * x).sum * Dedup.SemTauNum
    } yield (vb, va))
      .groupBy(_._1)
      .map { case (v, ps) => (v, ps.map(_._2).min, ps.length.toLong) }
      .toSet
    val got = Dedup.semantic(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got.nonEmpty, "semantic dedup must find pairs at sf0.001 (driver smoke)")
    assert(got == expected)
  }
}
