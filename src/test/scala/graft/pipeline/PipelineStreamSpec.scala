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
  ) ++ (100L until 160L).map(i => StreamDoc(i, s"doc $i the table value row"))

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

  test("chunking: streaming == batch") {
    val b = batch(TextAnalysis.chunkOf)
    assert(b.size > docs.size) // the long doc must split into several chunks
    assert(streamed("pipe_chunk", TextAnalysis.chunkOf) == b)
  }

  test("bernoulli sample: streaming == batch, and deterministic across runs") {
    val b = batch(Sampling.bernoulliOf)
    assert(b.nonEmpty && b.size < docs.size)
    assert(streamed("pipe_sample", Sampling.bernoulliOf) == b)
    assert(batch(Sampling.bernoulliOf) == b) // re-run picks the same docs
  }
}
