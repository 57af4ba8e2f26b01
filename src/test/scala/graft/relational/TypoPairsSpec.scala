package graft.relational

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** FastSS typo-pair mining: planted-misspelling fixture plus the
  * blocking-exactness property — the deletion-neighborhood candidates with
  * levenshtein verification must equal the brute-force all-pairs answer on
  * random small-alphabet vocabularies (where accidental distance-≤2 pairs
  * are common).
  */
class TypoPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(docs: Seq[String]): Set[(String, String, Int)] = {
    import spark.implicits._
    TextSim.typoPairsOf(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .select("w1", "w2", "dist")
      .as[(String, String, Int)].collect().toSet
  }

  private def brute(docs: Seq[String]): Set[(String, String, Int)] = {
    val vocab = docs.flatMap(_.toLowerCase.split("\\s+"))
      .filter(w => w.nonEmpty && w.length >= TextSim.TypoMinLen).distinct
    (for {
      a <- vocab; b <- vocab
      if a < b && lev(a, b) <= TextSim.TypoMaxDist
    } yield (a, b, lev(a, b))).toSet
  }

  test("planted misspelling pairs with its frequent form, with counts") {
    import spark.implicits._
    val docs = Seq.fill(10)("the quick brown fox") ++ Seq("teh quikc brown fox")
    val got = TextSim.typoPairsOf(docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .as[(String, String, Long, Long, Int)].collect().toSeq
    // quick/quikc (transposition = distance 2) and teh/the (distance 2);
    // fox is below TypoMinLen, brown pairs with nothing
    assert(got.map(r => (r._1, r._2)).toSet ==
      Set(("quick", "quikc"), ("teh", "the")), got.toString)
    val q = got.find(_._1 == "quick").get
    assert(q._3 == 10L && q._4 == 1L && q._5 == 2, q.toString)
  }

  test("deletion-neighborhood blocking is exact vs brute force") {
    val rnd = new Random(13)
    for (trial <- 1 to 5) {
      // dense vocab over a 3-letter alphabet, lengths 3..6
      val vocab = Seq.fill(40)(
        (0 until 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = vocab.grouped(8).map(_.mkString(" ")).toSeq
      assert(run(docs) == brute(docs), s"trial $trial")
    }
  }
}
