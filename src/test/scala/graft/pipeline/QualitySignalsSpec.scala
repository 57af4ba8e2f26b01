package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixtures for the round-8 quality/sampling additions: character
  * entropy, priority sampling, the per-source embedding-drift matrix,
  * and the tf-idf re-scored near-dup pairs.
  */
class QualitySignalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entropy: repeated-char junk scores 0; a uniform 2-symbol doc scores ln 2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),   // one symbol: H = 0 exactly
      (2L, "abab"),       // two symbols, uniform: H = ln 2
      (3L, "")            // empty: excluded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.entropyOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // ln 2 in floor-micro-nats through the exact integer identity:
    // (4·L(4) − 2·2·L(2)) div 4 with L(x) = floor(ln(x)·1e6)
    val l2 = math.floor(math.log(2) * 1e6).toLong
    val l4 = math.floor(math.log(4) * 1e6).toLong
    val expectAbab = (4L * l4 - 4L * l2) / 4L
    assert(got == Seq((1L, 8L, 1L, 0L), (2L, 4L, 2L, expectAbab)), got.toString)
  }

  test("entropy orders junk below prose below flat gibberish") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zzzzzzzzzzzzzzzzzzzzzzzz"),                 // junk
      (2L, "the quick brown fox jumps over the dog"),   // prose
      (3L, "abcdefghijklmnopqrstuvwxyz")                // flat histogram
    ).toDF("doc_id", "text")
    val e = TextAnalysis.entropyOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(e(1L) < e(2L) && e(2L) < e(3L), e.toString)
  }

  test("priority sampling: k >= n degenerates to the exact total (tau = 0)") {
    import spark.implicits._
    val docs = (1L to 7L).map(i => (i, "s", i * 100L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.priorityOf(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(got.length == 7)
    // every doc sampled, threshold 0 → est == w exactly, Σ est == Σ w
    assert(got.forall { case (_, w, est) => est == w }, got.mkString(", "))
  }

  test("priority sampling: k < n keeps the top-k priorities and est = max(w, tau)") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, "s", 100L + i))
      .toDF("doc_id", "source", "n_chars")
    val k = 5
    val got = Sampling.priorityOf(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == k)
    // recompute τ = the (k+1)-th priority driver-side from the same hash
    val prios = Sampling.priorityOf(docs, 50).collect()
      .map(r => r.getLong(3)).sorted(Ordering.Long.reverse)
    val tau = prios(k)
    assert(got.forall { case (_, _, p, _) => p > tau })
    assert(got.forall { case (_, w, _, est) => est == math.max(w, tau / 1000000L) },
      got.mkString(", "))
    // deterministic: a re-run selects the identical sample
    val rerun = Sampling.priorityOf(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rerun.toSeq == got.toSeq)
  }

  test("embedding drift: identical, orthogonal, and opposed centroids") {
    import spark.implicits._
    // centroid table direct: (source, dim, n_vecs, mean_micro)
    val rows = Seq(
      ("a", 0, 10L, 1000L), ("a", 1, 10L, 0L),
      ("b", 0, 10L, 1000L), ("b", 1, 10L, 0L),     // == a  → +10000
      ("c", 0, 10L, 0L), ("c", 1, 10L, 1000L),     // ⟂ a   → 0
      ("d", 0, 10L, -1000L), ("d", 1, 10L, 0L)     // −a    → −10000
    ).toDF("source", "dim", "n_vecs", "mean_micro")
    val got = Embeddings.driftOf(rows).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    assert(got(("a", "b")) == 10000L, got.toString)
    assert(got(("a", "c")) == 0L, got.toString)
    assert(got(("a", "d")) == -10000L, got.toString)
    assert(got.size == 6)
  }

  test("tfidf pairs: planted near-copy scores above threshold, unrelated doc absent") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val aCopy = "x0 " + (2 to 40).map(i => s"w$i").mkString(" ") // 1 word changed
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, a), (2L, aCopy), (3L, other)).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)), got.mkString(", "))
    assert(got.head._3 >= TextAnalysis.SparseMinCosBp, got.head.toString)
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
