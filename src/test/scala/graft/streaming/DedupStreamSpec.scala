package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class DupDoc(doc_id: Long, text: String, ts: Timestamp)

/** `DedupStream` semantics pinned over MemoryStream micro-batches.
  * Deterministic contract: a copy arriving in a LATER micro-batch than its
  * original (with live state) is always dropped; within one micro-batch one
  * arbitrary row per digest survives (exchange order, not arrival order —
  * same as batch `dropDuplicates`). Timestamps sit well above epoch 0: the
  * initial watermark is 0, and rows at-or-below the watermark are discarded
  * as late before dedup even sees them.
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Long) = new Timestamp((600 + min) * 60000L)

  private def run(chunks: Seq[Seq[DupDoc]], delay: String): Seq[Long] = {
    import spark.implicits._
    val mem = MemoryStream[DupDoc]
    val q = DedupStream.dedup(mem.toDF(), delay).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("dedup_out").collect().map(_.getLong(0)).toSeq.sorted
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS dedup_out")
    }
  }

  private val docs = Seq(
    DupDoc(1L, "alpha beta gamma", ts(0)),
    DupDoc(2L, "delta epsilon", ts(1)),
    DupDoc(3L, "alpha beta gamma", ts(2)),  // copy of 1 → dropped
    DupDoc(4L, "zeta eta", ts(3)),
    DupDoc(5L, "delta epsilon", ts(4)),     // copy of 2 → dropped
    DupDoc(6L, "alpha beta gamma", ts(5)))  // copy of 1 → dropped

  test("cross-batch copies dropped while digest state lives") {
    // originals in batch 1, every copy in later batches → fully deterministic
    assert(run(Seq(docs.take(2), docs.slice(2, 5), docs.drop(5)), "10 minutes")
      == Seq(1L, 2L, 4L))
    assert(run(docs.map(Seq(_)), "10 minutes") == Seq(1L, 2L, 4L))
  }

  test("single batch: exactly one survivor per digest") {
    val got = run(Seq(docs), "10 minutes")
    assert(got.size == 3)
    val byDigest = docs.groupBy(_.text).values.map(_.map(_.doc_id).toSet).toSeq
    assert(byDigest.forall(g => g.count(got.contains) == 1))
  }

  test("copy arriving after state eviction is admitted again (horizon trade)") {
    // delay 2 min: the t=+50 pusher advances the watermark to +48, expiring
    // digest state from t∈[0,1]; the copy at t=+60 is then admitted again.
    val late = Seq(
      Seq(DupDoc(1L, "alpha beta gamma", ts(0)), DupDoc(2L, "delta epsilon", ts(1))),
      Seq(DupDoc(9L, "watermark pusher", ts(50))),
      Seq(DupDoc(3L, "alpha beta gamma", ts(60))))
    assert(run(late, "2 minutes") == Seq(1L, 2L, 3L, 9L))
  }
}
