package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted doc-in-doc fixture for the asymmetric containment detector:
  * a short quoted passage inside a much longer page must flag in exactly
  * one direction — the case symmetric Jaccard structurally misses.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quoted passage flags contained-in-page, not the reverse") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ") // 12 tokens, 10 shingles
    val page = quote + " " + (1 to 80).map(i => s"p$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, page), (3L, other)).toDF("doc_id", "text")

    val got = Dedup.containmentOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1's 10 shingles all appear in doc 2 (page starts with the quote,
    // plus the 2 boundary shingles q11 q12 p1 / q12 p1 p2 — still ≥ 80%)
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)), got.toString)
    val (_, _, inter, nA, bp) = got.head
    assert(nA == 10L && inter == 10L && bp == 10000L, got.head.toString)
    // the page itself is NOT contained in the quote (asymmetry), and the
    // unrelated doc never pairs: both absent above.
  }

  test("jaccard-low containment-high: the pair the symmetric pass misses") {
    import spark.implicits._
    val quote = (1 to 22).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 400).map(i => s"p$i").mkString(" ")
    val docs = Seq((10L, quote), (20L, page)).toDF("doc_id", "text")
    // symmetric verify at 30% Jaccard (the q_dedup_ngram threshold) fails:
    // inter=20, union=20+420-20 → jaccard < 5%
    val cont = Dedup.containmentOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(cont.map(r => (r._1, r._2)) == Seq((10L, 20L)), cont.toString)
    assert(cont.head._5 == 10000L)
  }

  test("viral shingle is guarded: no quadratic pair fan-out, cold pairs survive") {
    import spark.implicits._
    val viral = "x1 x2 x3" // one shingle shared by > MaxShingleBucket docs
    val boiler = (0 until Dedup.MaxShingleBucket + 1)
      .map(i => (100L + i, viral))
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 30).map(i => s"p$i").mkString(" ")
    val docs = (boiler ++ Seq((1L, quote), (2L, page)))
      .toDF("doc_id", "text")
    val got = Dedup.containmentOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the 201 boilerplate docs produce ZERO pairs (their only shingle is
    // dropped); the planted containment pair is unaffected
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)), got.toString)
  }

  test("recallAudit: empty truth set reports recall 0, not NULL") {
    import spark.implicits._
    // three docs sharing no shingle at all: n_true = 0, the division guard
    // must report 0 instead of a NULL / divide-by-zero divergence
    val docs = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 10).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.recallAuditOf(spark, docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 0L, 0L, 0L)), r.toString)
  }

  test("recallAudit: over-cap input trips the audit-scale require") {
    import spark.implicits._
    val docs = spark.range(Dedup.MaxRecallAuditDocs + 1)
      .selectExpr("id AS doc_id", "'w1 w2 w3 w4 w5' AS text")
    val e = intercept[IllegalArgumentException] {
      Dedup.recallAuditOf(spark, docs)
    }
    assert(e.getMessage.contains("audit-scale only"), e.getMessage)
  }
}
