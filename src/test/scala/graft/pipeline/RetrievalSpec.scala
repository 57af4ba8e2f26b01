package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bm25: rare discriminative term dominates common terms") {
    val rows = Retrieval.bm25(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === Retrieval.TopK)
    // scores are positive and the head is sorted
    val scores = rows.map(_.getLong(1))
    assert(scores.forall(_ > 0))
    assert(scores.toSeq === scores.sortBy(-_).toSeq)
    // every doc in the head must contain the rare term 'dup': its idf is
    // ~ln(N/df_dup) while the common terms' idf is near ln(1) — a doc
    // scoring on commons alone cannot beat a dup-containing doc
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    import spark.implicits._
    val dupDocs = docs
      .filter(org.apache.spark.sql.functions.lower($"text").contains("dup"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val headIds = rows.map(_.getLong(0)).toSet
    assert(headIds.subsetOf(dupDocs),
      s"non-dup docs in BM25 head: ${headIds -- dupDocs}")
  }

  test("ann recall audit: bounded, and high at radius-2 multiprobe") {
    val rows = Retrieval.annRecall(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === Similarity.QueryVecs)
    rows.foreach { r =>
      val (h, bp) = (r.getLong(1), r.getLong(2))
      assert(h >= 0 && h <= Retrieval.RecallK)
      assert(bp === h * 10000 / Retrieval.RecallK)
    }
    // 4 planes, radius 2 probes 11/16 buckets — recall across the query
    // set should be well above coin-flip (exact value pinned by the oracle)
    val mean = rows.map(_.getLong(2)).sum / rows.length
    assert(mean >= 5000, s"mean recall $mean bp")
  }
}
