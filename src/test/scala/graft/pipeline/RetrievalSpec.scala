package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("phrase: positional adjacency, overlaps, repeated-token phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the table scan runs a table scan now"), // 2 hits, non-adjacent
      (2L, "table junk scan"),                      // words present, no hit
      (3L, "scan table"),                           // reversed order, no hit
      (4L, "batch batch batch"),                    // OVERLAPPING: 2 hits
      (5L, "sort merge join sort merge"),           // 1 three-token hit
      (6L, "sort join merge")                       // permuted, no hit
    ).toDF("doc_id", "text")
    val phrases = Seq((1, "table scan"), (2, "batch batch"),
      (3, "sort merge join"))
    val got = Retrieval.phraseOf(docs, phrases)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("batch batch", 4L, 2L),
      ("sort merge join", 5L, 1L),
      ("table scan", 1L, 2L)), got.toString)
  }

  test("phrase: a repeated-token phrase cannot double-count one position") {
    import spark.implicits._
    // "x batch x": 'batch' matches offset 0 AND offset 1 of "batch batch",
    // producing two start candidates each with ONE distinct offset — the
    // countDistinct(off) == len gate must reject both
    val docs = Seq((1L, "x batch x")).toDF("doc_id", "text")
    val got = Retrieval.phraseOf(docs, Seq((1, "batch batch"))).collect()
    assert(got.isEmpty)
  }

  test("phrase: randomized property — positional index == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(1789)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val docs = (0 until 40).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val phrases = (1 to 4).map { pid =>
        (pid, Seq.fill(1 + rnd.nextInt(3))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // brute force: count sliding-window matches (overlaps included)
      val exp = (for {
        (pid, p) <- phrases
        pw = p.split(' ').toSeq
        (id, text) <- docs
        tw = text.split(' ').toSeq
        n = tw.indices.count(i => tw.slice(i, i + pw.size) == pw)
        if n > 0
      } yield (p, id, n.toLong)).toSet
      val got = Retrieval.phraseOf(docs.toDF("doc_id", "text"), phrases)
        .as[(String, Long, Long)].collect().toSet
      assert(got == exp, s"trial $trial: ${got -- exp} / ${exp -- got}")
    }
  }

  test("phrase flags: streaming detector == batch index existence") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val phrases = Retrieval.Phrases
    // batch truth: existence from the positional index
    val exp = Retrieval.phraseOf(docs, phrases)
      .select($"doc_id", $"phrase").as[(Long, String)].collect().toSet
    // batch flags agree
    val flagsBatch = Retrieval.phraseFlagsOf(docs, phrases)
      .as[(Long, String)].collect().toSet
    assert(flagsBatch == exp)
    // streaming: same rows out of a MemoryStream, any slicing
    val rows = docs.as[(Long, String)].collect().toVector
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Retrieval.phraseFlagsOf(
        mem.toDS().toDF("doc_id", "text"), phrases)
      .writeStream.format("memory").queryName("ph_flags")
      .outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      val got = spark.table("ph_flags").as[(Long, String)].collect().toSet
      assert(got == exp)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS ph_flags")
    }
  }

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

  test("rrf == an in-memory fusion of the two arms' independent rankings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // lexical arm re-ranked from the declared bm25 head's UNDERLYING table:
    // recompute full scores via the public bm25 head being a prefix is not
    // enough (pool is 100 > TopK), so rebuild ranks from first principles
    // on the dense side and cross-check structure on the lexical side.
    val got = Retrieval.rrf(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size === Retrieval.RrfTop)
    // sorted by fused score desc, doc tiebreak
    assert(got.map(r => (-r._2, r._1)) === got.map(r => (-r._2, r._1)).sorted)
    // every fused score equals the reciprocal-rank sum of its emitted ranks
    got.foreach { case (_, rrf, rl, rd) =>
      val e = (if (rl > 0) 1000000L / (Retrieval.RrfK + rl) else 0L) +
        (if (rd > 0) 1000000L / (Retrieval.RrfK + rd) else 0L)
      assert(rrf === e)
      assert(rl >= 0 && rl <= Retrieval.RrfPool && rd >= 0 && rd <= Retrieval.RrfPool)
      assert(rl > 0 || rd > 0)
    }
    // dense arm oracle: brute-force dot ranking against query vec 0
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", Hashing.quantize($"embedding").as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    val qv = e(Retrieval.DenseQueryVec)
    val denseRank = e.toSeq.filter(_._1 != Retrieval.DenseQueryVec)
      .map { case (id, q) => (id, q.zip(qv).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, dot) => (-dot, id) }
      .take(Retrieval.RrfPool).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    got.foreach { case (doc, _, _, rd) =>
      assert(rd === denseRank.getOrElse(doc, 0L), s"doc $doc dense rank")
    }
    // a doc at the top of BOTH pools must outrank one present in only one:
    // the head contains at least one doc with both ranks set
    assert(got.exists(r => r._3 > 0 && r._4 > 0) || got.forall(_._3 == 0))
  }
}
