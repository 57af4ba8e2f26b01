package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming ≡ batch for embedding near-dup: when arrival order equals
  * vec_id order, the keep-first verdicts derive exactly from the batch
  * pair table ([[graft.pipeline.Dedup.embedding]]) — `dup_of(d)` is the
  * minimum `a` over batch pairs `(a, d)`, and every other vector is kept.
  */
class EmbedDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val sf = "/root/testdata/sf0.001"

  case class Vec(key: String, vec_id: Long, embedding: Seq[Float])

  test("keep-first verdicts == batch pair table (vec_id arrival order)") {
    import spark.implicits._
    val vecs = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .sortBy(_._1).map { case (id, e) => Vec("all", id, e) }
    assert(vecs.nonEmpty)
    // expected: batch pairs (vec_a < vec_b) → per-vector earliest dup
    val batchPairs = graft.pipeline.Dedup.embedding(spark, sf)
      .as[(Long, Long)].collect()
    assert(batchPairs.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    val expected = vecs.map(_.vec_id).map { id =>
      val preds = batchPairs.collect { case (a, b) if b == id => a }
      id -> (if (preds.isEmpty) -1L else preds.min)
    }.toMap

    val input = MemoryStream[Vec]
    val q = EmbedDupStream.annotate(input.toDF()).writeStream
      .format("memory").queryName("embdup").outputMode("append").start()
    try {
      // two micro-batches: verdicts must not depend on batch boundaries
      input.addData(vecs.take(vecs.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(vecs.drop(vecs.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("embdup")
        .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }
}
