package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import PackStream.{Chunk, Packed}

/** Streaming packing: per-key offsets carry across micro-batches, pack ids
  * equal a serial per-key recompute over the same arrival order, and state
  * survives batch boundaries mid-pack.
  */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val budget = 10

  test("per-key running offsets across micro-batches match serial packing") {
    import spark.implicits._
    val input = MemoryStream[Chunk]
    val q = PackStream.pack(input.toDS(), budget).writeStream
      .format("memory").queryName("packed").outputMode("append").start()
    try {
      val b1 = Seq(
        Chunk("s0", 1, 0, 7), Chunk("s0", 1, 1, 6), Chunk("s0", 2, 0, 4),
        Chunk("s1", 3, 0, 9))
      val b2 = Seq(
        Chunk("s0", 4, 0, 8), // s0 resumes mid-pack at offset 17
        Chunk("s1", 5, 0, 2), Chunk("s1", 5, 1, 3))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()

      val got = spark.table("packed").as[Packed].collect()
        .map(p => (p.key, p.doc_id, p.chunk_id) -> p.pack_id).toMap

      // serial reference per key over the same batch-then-(doc,chunk) order
      var offs = Map.empty[String, Long].withDefaultValue(0L)
      val expected = (b1.sortBy(c => (c.doc_id, c.chunk_id)) ++
        b2.sortBy(c => (c.doc_id, c.chunk_id))).map { c =>
        val off = offs(c.key)
        offs += c.key -> (off + c.n_tok)
        (c.key, c.doc_id, c.chunk_id) -> off / budget
      }.toMap
      assert(got == expected)
      // spot-check the mid-pack resume: s0 offset 17 → pack 1
      assert(got(("s0", 4L, 0)) == 1L)
    } finally q.stop()
  }
}
