package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the driver's t1 smoke: entry() and every declared query must
  * return rows at sf0.001. Catches empty-result and hard-failure regressions
  * before the driver does.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is a documented non-oracle op") {
    val nonOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // CEP + MATCH_RECOGNIZE queries: sequential after-match-skip semantics
    // are not SQL-expressible (DuckDB has no MATCH_RECOGNIZE); pinned by
    // golden/property/front-end-equivalence tests. The approx scale paths
    // (t-digest quantiles, HLL distinct) are sketch-valued
    // (implementation-defined), each pinned by a tolerance test against its
    // exact oracled twin.
    val documented = Set("q_text_length_stats_approx", "q_text_vocab_approx")
    assert(nonOracle.forall(q =>
      q.startsWith("q_cep_") || q.startsWith("q_mr_") || documented(q)),
      s"undocumented non-oracle: $nonOracle")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
