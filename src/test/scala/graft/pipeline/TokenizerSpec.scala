package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE pair counting against a hand-computed fixture (the declared query is
  * oracle-gated at sf0.01; this pins the word-count weighting and the
  * deterministic ranking independently).
  */
class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pair counts are word-frequency weighted with deterministic ranking") {
    import spark.implicits._
    // corpus: "ab ab cd" + "ab xx" → words: ab×3, cd×1, xx×1
    // pairs: (a,b)=3, (c,d)=1, (x,x)=1 → ranks: (a,b), (c,d), (x,x)
    val docs = Seq("ab ab cd", "ab xx").toDF("text")
    val got = Tokenizer.bpePairsOf(spark, docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 3L), (2, "c", "d", 1L), (3, "x", "x", 1L)))
  }

  test("single-char and mixed-case words fold correctly") {
    import spark.implicits._
    // "A a" lowercases to a×2 (no pairs); "abc" has (a,b) and (b,c)
    val docs = Seq("A a abc").toDF("text")
    val got = Tokenizer.bpePairsOf(spark, docs)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(("a", "b", 1L), ("b", "c", 1L)))
  }
}
