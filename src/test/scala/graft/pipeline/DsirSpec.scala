package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR importance selection against a brute-force Scala oracle replicating
  * the exact bucket/ratio/score arithmetic, over a planted two-vocabulary
  * corpus: raw docs written in the target's vocabulary must outrank raw docs
  * written in the raw vocabulary.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val B = Sampling.DsirBuckets
  private def cfh(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c) % Hashing.M)
  private def bkt(t: String): Long = cfh("dsir:" + t) % B

  private val tgtVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
  private val rawVocab = Seq("zeta", "eta", "theta", "iota", "kappa", "lambda")

  // 4 target docs; raw docs: 3 target-flavored (planted winners), 6 raw-flavored
  private val docs: Seq[(Long, String, String)] =
    (0L until 4L).map(i => (i, "tgt",
      (0 until 12).map(j => tgtVocab(((i + j) % tgtVocab.size).toInt)).mkString(" "))) ++
    (10L until 13L).map(i => (i, "raw",
      (0 until 10).map(j => tgtVocab(((i + j) % tgtVocab.size).toInt)).mkString(" "))) ++
    (20L until 26L).map(i => (i, "raw",
      (0 until 10).map(j => rawVocab(((i + j) % rawVocab.size).toInt)).mkString(" ")))

  /** Brute-force oracle: same +1-smoothed hashed-unigram log-ratio sum. */
  private def expected(topK: Int): Seq[(Long, Int, Long)] = {
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, src, bkt(t)))
    }
    val tc = toks.filter(_._2 == "tgt").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rc = toks.filter(_._2 != "tgt").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tt = tc.values.sum; val rt = rc.values.sum
    def lr(b: Long): Long = math.floor(math.log(
      ((tc.getOrElse(b, 0L) + 1L) * (rt + B)).toDouble /
        ((rc.getOrElse(b, 0L) + 1L) * (tt + B)).toDouble) * 1e6).toLong
    toks.filter(_._2 != "tgt").groupBy(_._1).toSeq
      .map { case (id, ts) => (id, ts.size, ts.map(t => lr(t._3)).sum) }
      .sortBy { case (id, _, w) => (-w, id) }
      .take(topK)
  }

  test("matches the brute-force oracle and ranks planted target-flavored docs first") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "source", "text")
    val got = Sampling.dsirOf(df, "tgt", 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected(5))
    // the 3 target-flavored raw docs take the top 3 slots, positive weight
    assert(got.take(3).map(_._1).toSet == Set(10L, 11L, 12L))
    assert(got.take(3).forall(_._3 > 0))
    // raw-flavored docs carry negative weight
    assert(got.drop(3).forall(_._3 < 0))
  }

  test("frozen-model scorer ≡ join-path scores") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "source", "text")
    val joinPath = Sampling.dsirOf(df, "tgt", 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val scorer = Sampling.dsirScorerOf(Sampling.dsirModel(df, "tgt"))
    val scored = scorer(df).filter($"source" =!= "tgt")
      .select($"doc_id", $"n_tok", $"logw_micro").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(scored == joinPath)
  }

  test("topK truncates deterministically") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "source", "text")
    val all = Sampling.dsirOf(df, "tgt", 100).collect().map(_.getLong(0)).toSeq
    assert(all.size == 9) // every raw doc scored
    assert(Sampling.dsirOf(df, "tgt", 4).collect().map(_.getLong(0)).toSeq
      == all.take(4))
  }
}
