package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.NearDupStream

case class NearDoc(key: String, doc_id: Long, text: String)

/** Streaming keep-first near-dup curation against the batch LSH pair graph:
  * when arrival order equals doc_id order, a doc is dropped by the stream
  * iff the batch `minhashPairs` table contains a pair (a, doc) with a <
  * doc — same signatures, same banding, same agreement threshold. Pinned
  * over MemoryStream micro-batches (including batch-boundary invariance and
  * shard isolation).
  */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // exact-dup families (8/8 agreement guaranteed), perturbed variants (the
  // LSH math decides), unrelated fillers, and a sub-3-token doc (no shingles)
  private val docs: Seq[NearDoc] = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val alt = "streams of tokens flow through the curation pipeline stage by stage"
    Seq(
      NearDoc("k", 1L, base),
      NearDoc("k", 2L, alt),
      NearDoc("k", 3L, base),                                  // exact dup of 1
      NearDoc("k", 4L, base.replace("lazy", "sleepy")),        // near of 1?
      NearDoc("k", 5L, "tiny doc"),                            // no shingles
      NearDoc("k", 6L, alt),                                   // exact dup of 2
      NearDoc("k", 7L, alt.replace("tokens", "rows")),         // near of 2?
    ) ++ (10L until 40L).map { i =>
      NearDoc("k", i,
        if (i % 5 == 0) base // more exact dups of 1
        else s"unique filler document number $i with its own distinct words $i")
    }
  }

  private def annotatedStream(input: Seq[Seq[NearDoc]]): Map[Long, Long] = {
    import spark.implicits._
    val mem = MemoryStream[NearDoc]
    val q = NearDupStream.annotate(mem.toDF()).writeStream
      .format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      input.foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      spark.table("neardup_out").collect()
        .map(r => r.getLong(1) -> r.getLong(2)).toMap
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS neardup_out")
    }
  }

  /** Batch oracle: dup_of(d) = min a with (a, d) in the LSH pair table. */
  private def batchExpected(ds: Seq[NearDoc]): Map[Long, Long] = {
    import spark.implicits._
    val pairs = Dedup.minhashPairs(spark, ds.toDF("key", "doc_id", "text"))
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dupOf = pairs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    ds.map(d => d.doc_id -> dupOf.getOrElse(d.doc_id, -1L)).toMap
  }

  test("streaming keep-first ≡ batch pair graph (3 micro-batches)") {
    val expected = batchExpected(docs)
    val got = annotatedStream(Seq(docs.take(4), docs.slice(4, 9), docs.drop(9)))
    assert(got == expected)
    // sanity on the fixture: real dups and real keeps both occur
    assert(expected.valuesIterator.count(_ >= 0) >= 7, expected.toString)
    assert(expected.valuesIterator.count(_ < 0) >= 10)
    assert(expected(3L) == 1L && expected(6L) == 2L && expected(5L) == -1L)
  }

  test("batch-boundary invariance: one batch ≡ many batches") {
    val one = annotatedStream(Seq(docs))
    val many = annotatedStream(docs.grouped(3).toSeq)
    assert(one == many)
  }

  test("shard isolation: identical docs under different keys are both kept") {
    val sharded = Seq(
      NearDoc("k1", 1L, "alpha beta gamma delta epsilon zeta"),
      NearDoc("k2", 2L, "alpha beta gamma delta epsilon zeta"))
    val got = annotatedStream(Seq(sharded))
    assert(got == Map(1L -> -1L, 2L -> -1L))
  }

  test("query restart from checkpoint preserves the signature store") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    val mem = MemoryStream[NearDoc]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def start() = NearDupStream.annotate(mem.toDF()).writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupStream.Annotated], _: Long) =>
        b.collect().foreach(a => got.add((a.doc_id, a.dup_of)))
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val base = "the quick brown fox jumps over the lazy dog again and again"
    // run 1: the original enters the signature store
    val q1 = start()
    try {
      mem.addData(NearDoc("k", 1L, base))
      q1.processAllAvailable()
      assert(got.asScala.toSet == Set(1L -> -1L))
    } finally q1.stop()

    // run 2 (fresh query instance, same checkpoint): an exact dup arrives —
    // flagged ONLY if the RocksDB MapState survived the restart
    val q2 = start()
    try {
      mem.addData(NearDoc("k", 2L, base))
      q2.processAllAvailable()
      assert(got.asScala.toSet == Set(1L -> -1L, 2L -> 1L))
    } finally q2.stop()
  }

  test("curateNear composition applies the batch sample filter to survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[NearDoc]
    val q = NearDupStream.curateNear(mem.toDF()).writeStream
      .format("memory").queryName("neardup_cur").outputMode("append").start()
    val got =
      try {
        mem.addData(docs: _*)
        q.processAllAvailable()
        spark.table("neardup_cur").collect().map(_.getLong(1)).toSet
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS neardup_cur")
      }
    // batch recomputation: keep-first survivors → same salted-hash filter
    val kept = batchExpected(docs).collect { case (id, -1L) => id }.toSeq
    val expected = kept.toDF("doc_id")
      .filter(Hashing.charFoldHash(
        concat(lit("near:"), $"doc_id".cast("string"))) % 100 < Curation.CuratePct)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(expected.nonEmpty && expected.size < kept.size)
  }
}
