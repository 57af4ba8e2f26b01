package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Span-level dedup invariants on the real sf0.001 corpus, plus the Bloom
  * runtime-filter equivalence pin for the incremental operator.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("spans: totals match a brute-force recount; dup counts are sane") {
    import spark.implicits._
    val out = SpanDedup.spans(spark, sf)
      .as[(Long, Int, Long)].collect().toSeq
    // Brute force: re-derive span multiset on the driver.
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams = docs.map { case (id, text) =>
      val w = text.split(" ").filter(_.nonEmpty)
      id -> w.sliding(SpanDedup.SpanK).filter(_.length == SpanDedup.SpanK)
        .map(_.mkString(" ")).toSeq
    }.toMap
    val counts = grams.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(out.map(_._1).toSet == docs.map(_._1).toSet) // every doc present
    out.foreach { case (id, nSpans, nDup) =>
      val g = grams(id)
      assert(nSpans == g.size, s"doc $id n_spans")
      assert(nDup == g.count(counts(_) > 1), s"doc $id n_dup")
    }
    assert(out.map(_._3).sum > 0, "corpus should contain duplicated spans")
  }

  test("incremental: bloom-prefiltered plan ≡ exact plan (bloom never changes the answer)") {
    val withBloom = SpanDedup.incremental(spark, sf).collect().toSeq
    val exact = SpanDedup.incrementalExact(spark, sf).collect().toSeq
    assert(withBloom.map(r => (r.getLong(0), r.getLong(1))) ==
      exact.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("incremental: the bloom subquery plan actually contains the runtime filter") {
    val plan = SpanDedup.incremental(spark, sf).queryExecution.optimizedPlan
    val txt = plan.toString
    assert(txt.contains("bloom_filter_agg") || txt.contains("BloomFilter"),
      s"expected a bloom filter in the plan, got:\n$txt")
    assert(txt.contains("might_contain"), "expected might_contain probe")
  }
}
