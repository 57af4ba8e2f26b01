package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class StreamDoc(doc_id: Long, text: String)

/** The stateless pipeline transforms (redaction, chunking, Bernoulli
  * sampling) are DataFrame→DataFrame and narrow, so the SAME code must run
  * on a stream and produce batch-identical results — the property that lets
  * one curation codebase serve both the backfill job and the live ingest
  * path. Pinned here over micro-batched MemoryStream input.
  */
class PipelineStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val docs = Seq(
    StreamDoc(3L, "the customer key stream filter a value merge"),
    StreamDoc(7L, "join window table row the big batch"),
    StreamDoc(11L, Seq.fill(50)("scan merge data").mkString(" ")),
    StreamDoc(20L, "key"),
    StreamDoc(42L, "dup dup dup dup dup dup dup dup"),
  ) ++ (100L until 160L).map(i => StreamDoc(i,
    if (i % 3 == 0) s"doc $i key stream filter a row"   // shares doc 3's shingles
    else s"doc $i the table value row"))                // shares none

  private def streamed(
      name: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[String] = {
    import spark.implicits._
    val input = MemoryStream[StreamDoc]
    val q = f(input.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      // two micro-batches: transforms must not depend on batch boundaries
      input.addData(docs.take(3): _*)
      q.processAllAvailable()
      input.addData(docs.drop(3): _*)
      q.processAllAvailable()
      spark.table(name).collect().map(_.mkString("|")).toSeq.sorted
    } finally q.stop()
  }

  private def batch(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Seq[String] = {
    import spark.implicits._
    f(docs.toDF()).collect().map(_.mkString("|")).toSeq.sorted
  }

  test("redaction: streaming == batch") {
    val b = batch(TextAnalysis.redactOf)
    assert(b.nonEmpty && b.exists(_.contains("<FIELD>")))
    assert(streamed("pipe_redact", TextAnalysis.redactOf) == b)
  }

  test("repetition metrics: streaming == batch") {
    val b = batch(TextAnalysis.repetitionOf)
    // doc 42 is "dup dup dup ..." (8 tokens): 6 of 7 bigrams duplicate
    // (8571 bp), 5 of 6 trigrams (8333 bp), top token owns all 8 (10000 bp)
    assert(b.nonEmpty && b.exists(_.startsWith("42|8|8571|8333|8|10000")), b.toString)
    assert(streamed("pipe_rep", TextAnalysis.repetitionOf) == b)
  }

  test("classifier: streaming == batch") {
    val b = batch(TextAnalysis.classifierOf)
    // the scorer must split the tiny corpus (some kept, some dropped) for
    // the threshold to be exercised at all
    assert(b.exists(_.endsWith("|1")) && b.exists(_.endsWith("|0")), b.toString)
    assert(streamed("pipe_clf", TextAnalysis.classifierOf) == b)
  }

  test("character entropy: streaming == batch") {
    val b = batch(TextAnalysis.entropyOf)
    assert(b.size == docs.size)
    // doc 42 ("dup dup ...") must score below the mixed-word docs
    assert(streamed("pipe_entropy", TextAnalysis.entropyOf) == b)
  }

  test("chunking: streaming == batch") {
    val b = batch(TextAnalysis.chunkOf)
    assert(b.size > docs.size) // the long doc must split into several chunks
    assert(streamed("pipe_chunk", TextAnalysis.chunkOf) == b)
  }

  test("decontamination: stream-static broadcast join == batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // static eval side: shingles of the first two docs
    val evalSet = docs.take(2).toDF()
      .select(explode(array_distinct(
        Hashing.shingles3(Hashing.tokens($"text")))).as("sh"))
      .distinct()
    val train = docs.drop(2)
    val expected = Curation.decontaminateStream(train.toDF(), evalSet)
      .collect().map(_.mkString("|")).toSeq.sorted
    assert(expected.nonEmpty)

    val input = MemoryStream[StreamDoc]
    val q = Curation.decontaminateStream(input.toDF(), evalSet).writeStream
      .format("memory").queryName("pipe_decon").outputMode("complete").start()
    try {
      input.addData(train.take(10): _*)
      q.processAllAvailable()
      input.addData(train.drop(10): _*)
      q.processAllAvailable()
      val got = spark.table("pipe_decon").collect().map(_.mkString("|")).toSeq.sorted
      assert(got == expected)
    } finally q.stop()
  }

  test("incremental span dedup: stream-static join == batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // own corpus: 5-token spans must actually cross the corpus/batch line
    val corpusDocs = Seq(
      StreamDoc(1L, "alpha beta gamma delta epsilon zeta"),
      StreamDoc(2L, "one two three four five six seven"))
    val batch = Seq(
      StreamDoc(10L, "x alpha beta gamma delta epsilon y"), // shares a span
      StreamDoc(11L, "three four five six seven eight"),    // shares a span
      StreamDoc(12L, "nothing shared here at all ok")) ++
      (100L until 130L).map(i => StreamDoc(i,
        if (i % 2 == 0) s"pad $i one two three four five" else s"pad $i no overlap content"))
    val corpusSpans = corpusDocs.toDF()
      .select(explode(Hashing.shingleMd5(
        Hashing.tokens($"text"), SpanDedup.SpanK)).as("h"))
      .distinct()
    val expected = SpanDedup.incrementalStream(batch.toDF(), corpusSpans)
      .collect().map(_.mkString("|")).toSeq.sorted
    assert(expected.nonEmpty) // doc-100 family shares doc 3's span content

    val input = MemoryStream[StreamDoc]
    val q = SpanDedup.incrementalStream(input.toDF(), corpusSpans).writeStream
      .format("memory").queryName("pipe_spans").outputMode("complete").start()
    try {
      input.addData(batch.take(10): _*)
      q.processAllAvailable()
      input.addData(batch.drop(10): _*)
      q.processAllAvailable()
      val got = spark.table("pipe_spans").collect().map(_.mkString("|")).toSeq.sorted
      assert(got == expected)
    } finally q.stop()
  }

  test("bernoulli sample: streaming == batch, and deterministic across runs") {
    val b = batch(Sampling.bernoulliOf)
    assert(b.nonEmpty && b.size < docs.size)
    assert(streamed("pipe_sample", Sampling.bernoulliOf) == b)
    assert(batch(Sampling.bernoulliOf) == b) // re-run picks the same docs
  }

  test("winnowing fingerprints: streaming == batch") {
    val b = batch(Winnowing.winnowFpOf)
    assert(b.nonEmpty)
    assert(streamed("pipe_winnow", Winnowing.winnowFpOf) == b)
  }

  test("perceptual hashes (image/audio/video): streaming == batch") {
    val bi = batch(Multimodal.phashOf)
    assert(bi.size == docs.size)
    assert(streamed("pipe_phash", Multimodal.phashOf) == bi)
    val ba = batch(Multimodal.audioHashOf)
    assert(ba.size == docs.size)
    assert(streamed("pipe_audiohash", Multimodal.audioHashOf) == ba)
    val bv = batch(Multimodal.videoHashOf)
    assert(bv.size >= docs.size) // ≥1 frame per doc
    assert(streamed("pipe_videohash", Multimodal.videoHashOf) == bv)
  }

  test("video frame-sequence fingerprints: streaming == batch") {
    val b = batch(Multimodal.videoSeqFingerprintsOf)
    assert(b.nonEmpty)
    assert(streamed("pipe_videoseq", Multimodal.videoSeqFingerprintsOf) == b)
  }

  test("scene cuts: streaming == batch") {
    val b = batch(Multimodal.sceneCutsOf)
    assert(b.nonEmpty) // the synthetic frames cycle bytes, so cuts exist
    assert(streamed("pipe_scenecut", Multimodal.sceneCutsOf) == b)
  }

  test("keyframes: streaming == batch") {
    val b = batch(Multimodal.keyframesOf)
    assert(b.nonEmpty)
    assert(streamed("pipe_keyframes", Multimodal.keyframesOf) == b)
  }

  test("BPE encode with a static merge model: streaming == batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // model trained on the batch snapshot — what a live ingest path loads;
    // application is a stateless per-row transform
    val (merges, words) = Tokenizer.bpeModelOf(spark, docs.toDF())
    words.unpersist()
    val model = merges.map { case (a, b, _) => (a, b) }
    def enc(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"), explode(Hashing.tokens(lower(col("text")))).as("word"))
        .select(col("doc_id"),
          explode(graft.functions.BpeApply(col("word"), model)).as("token"))
    val b = batch(enc)
    assert(b.nonEmpty)
    assert(streamed("pipe_bpe", enc) == b)
  }

  test("DSIR scoring with a frozen model: streaming == batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // model fit on the batch snapshot (target = doc_id % 3 == 0 slice);
    // scoring is a stateless literal-lookup transform — no join, no state
    def enrich(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.withColumn("source", concat(lit("s"), (col("doc_id") % 3).cast("string")))
    val model = Sampling.dsirModel(enrich(docs.toDF()), "s0")
    val score = (df: org.apache.spark.sql.DataFrame) =>
      Sampling.dsirScorerOf(model)(enrich(df))
    val b = batch(score)
    assert(b.size == docs.size)
    assert(streamed("pipe_dsir", score) == b)
  }

  test("IVF cell assignment with frozen centroids: streaming == trained batch") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // batch truth: the trained model's own (vec_id -> (cell, n2)) assignment
    val (cents, cells) = Similarity.ivfModel(spark, sf)
    val expected = cells.select($"vec_id", $"cell", $"n2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(expected.valuesIterator.map(_._1).toSet.size > 1,
      "fixture needs >1 populated cell")
    // frozen serving model — what a live ingest path loads from the index
    val assign = Similarity.ivfAssignerOf(Similarity.centroidArrayOf(cents))
    val rows = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()

    // batch side of the SAME transform
    val batchGot = assign(rows.toSeq.toDF("vec_id", "embedding"))
      .select($"vec_id", $"cell", $"n2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(batchGot == expected)

    // streaming side, two micro-batches
    val input = MemoryStream[(Long, Seq[Float])]
    val q = assign(input.toDF().toDF("vec_id", "embedding"))
      .select($"vec_id", $"cell", $"n2")
      .writeStream.format("memory").queryName("pipe_ivf_assign")
      .outputMode("append").start()
    try {
      input.addData(rows.take(rows.length / 2).toIndexedSeq)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("pipe_ivf_assign").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("mixture sampling: stream-static rate join == batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs need (source, n_chars) — derive both deterministically
    def enrich(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.withColumn("source", concat(lit("s"), (col("doc_id") % 3).cast("string")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    // static rate table from the full corpus snapshot (what a live ingest
    // path would load from the last backfill)
    // small budget so the rate threshold genuinely bites on this corpus
    val rates = Mixture.rateTable(enrich(docs.toDF()), budget = 300L)
    val b = batch(df => Mixture.mixtureOf(enrich(df), rates))
    assert(b.nonEmpty && b.size < docs.size, b.toString)
    assert(streamed("pipe_mixture", df => Mixture.mixtureOf(enrich(df), rates)) == b)
  }
}
