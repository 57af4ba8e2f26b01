package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class SinkRow(doc_id: Long, text: String)

/** The exactly-once manifest sink: end-to-end lossless over micro-batches,
  * idempotent on epoch retry (the foreachBatch redelivery case), and
  * torn writes (data dir without manifest) invisible to the reader.
  */
class ManifestSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(): String =
    Files.createTempDirectory("graft-manifest").toString

  test("streaming end-to-end: every input row lands exactly once") {
    import spark.implicits._
    val out = tmp(); val ckpt = tmp()
    val mem = MemoryStream[SinkRow]
    val rows = (1L to 30L).map(i => SinkRow(i, s"doc $i"))
    val q = ManifestSink.start(mem.toDF(), out, ckpt, "manifest_sink")
    try {
      rows.grouped(10).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = ManifestSink.readCommitted(spark, out)
      .select($"doc_id").as[Long].collect().sorted
    assert(got.toSeq == (1L to 30L))
    // one manifest per epoch, each matching an epoch dir
    val manifests = new java.io.File(s"$out/_manifests").list().toSeq.sorted
    assert(manifests.nonEmpty &&
      manifests.forall(m => Files.exists(Paths.get(out, s"epoch=$m"))))
  }

  test("epoch retry is idempotent: a second delivery of the same id is skipped") {
    import spark.implicits._
    val out = tmp()
    ManifestSink.writeEpoch(Seq(SinkRow(1L, "good")).toDF(), out, 7L)
    // redelivery after a "failure", now with different (corrupt) content —
    // the committed epoch must win
    ManifestSink.writeEpoch(Seq(SinkRow(666L, "corrupt")).toDF(), out, 7L)
    val got = ManifestSink.readCommitted(spark, out)
      .as[SinkRow].collect().toSeq
    assert(got == Seq(SinkRow(1L, "good")))
  }

  test("torn write (no manifest) is invisible; commit makes it visible") {
    import spark.implicits._
    val out = tmp()
    ManifestSink.writeEpoch(Seq(SinkRow(1L, "a")).toDF(), out, 0L)
    // simulate a crash between data write and manifest move for epoch 1
    Seq(SinkRow(2L, "torn")).toDF().write.parquet(s"$out/epoch=1")
    assert(ManifestSink.readCommitted(spark, out)
      .as[SinkRow].collect().toSeq == Seq(SinkRow(1L, "a")))
    // the retry completes the epoch (overwrite + manifest) — now visible
    ManifestSink.writeEpoch(Seq(SinkRow(2L, "b")).toDF(), out, 1L)
    assert(ManifestSink.readCommitted(spark, out)
      .as[SinkRow].collect().toSet == Set(SinkRow(1L, "a"), SinkRow(2L, "b")))
  }
}
