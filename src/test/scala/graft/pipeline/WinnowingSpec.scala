package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Winnowing fingerprints: pins the paper's two guarantees on fixtures the
  * oracle compare can't distinguish from luck — (1) any shared run of at
  * least W+K−1 tokens yields at least one SHARED fingerprint; (2) the
  * selection density is ~2/(W+1), far below one-per-gram.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[String]] = {
    import spark.implicits._
    Winnowing.winnowOf(spark, docs.toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
  }

  test("a shared >= W+K-1 token run yields a shared fingerprint") {
    // 7 shared tokens (= W+K-1) embedded at different offsets in unrelated text
    val shared = "one two three four five six seven"
    val f = fps(Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"x1 x2 $shared y1 y2 y3 y4")))
    assert(f(1L).intersect(f(2L)).nonEmpty,
      s"no shared fingerprint: ${f(1L)} vs ${f(2L)}")
  }

  test("unrelated documents share no fingerprints") {
    val f = fps(Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10")))
    assert(f(1L).intersect(f(2L)).isEmpty)
  }

  test("selection density is sub-linear (~2/(W+1) of grams)") {
    val words = (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val f = fps(Seq((1L, words)))
    val nGrams = 200 - Winnowing.K + 1
    val density = f(1L).size.toDouble / nGrams
    // expected 2/(W+1) = 0.4; allow generous slack either side, but far
    // below 1.0 (selecting every gram would defeat the point)
    assert(density > 0.15 && density < 0.7, s"density $density")
  }
}
