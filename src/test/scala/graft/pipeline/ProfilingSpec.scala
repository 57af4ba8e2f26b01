package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted fixtures for the profiling diagnostics: the MAD outlier screen
  * (exact discrete medians, integer threshold) and the PMI collocation
  * ranking (a planted phrase must outrank the background).
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MAD outliers: only the planted extreme doc flags; context is exact") {
    import spark.implicits._
    // source A: lengths 95..104 plus one 1000-char doc.
    // n=11 → median = rank 6 = 100; devs sorted 0,1,1,2,2,3,3,4,4,5,900
    // → MAD = rank 6 = 3; threshold 100·dev > 200·3 → dev > 6: only 900.
    val a = Seq(95, 96, 97, 98, 99, 100, 101, 102, 103, 104, 1000)
      .zipWithIndex.map { case (n, i) => ("A", i.toLong, n.toLong) }
    // source B: constant lengths → MAD 0; 100·dev > 0 flags any deviation
    val b = Seq(("B", 100L, 50L), ("B", 101L, 50L), ("B", 102L, 51L))
    val docs = (a ++ b).toDF("source", "doc_id", "n_chars")

    val got = Profiling.outliersOf(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 10L, 1000L, 100L, 3L),
      ("B", 102L, 51L, 50L, 0L)), got.toString)
  }

  test("collocations: a planted phrase outranks independent bigrams") {
    import spark.implicits._
    // "new york" always adjacent; filler words re-paired randomly enough
    // that their lift stays near 1. 10 docs × repeated phrase hits the
    // min-count gate.
    val rnd = new scala.util.Random(3)
    val filler = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0 until 10).map { i =>
      val words = Seq.fill(40)(filler(rnd.nextInt(filler.size))) ++
        Seq.fill(4)(Seq("new", "york")).flatten
      (i.toLong, rnd.shuffle(words.grouped(2).toSeq).flatten.mkString(" "))
    }.toDF("doc_id", "text")

    val got = TextAnalysis.collocationsOf(docs)
      .select("w1", "w2", "lift_micro")
      .as[(String, String, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.head._1 == "new" && got.head._2 == "york", got.take(3).toString)
    // lift is integer micro: independence sits at ~1e6, the phrase far above
    assert(got.head._3 > 2000000L, got.head.toString)
    val background = got.filter(p => !(p._1 == "new" && p._2 == "york"))
    assert(background.forall(_._3 < got.head._3), background.take(3).toString)
  }
}
