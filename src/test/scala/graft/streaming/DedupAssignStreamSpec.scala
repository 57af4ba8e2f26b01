package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming near-dup admission against the persisted MinHash index:
  * per-batch replay of [[graft.pipeline.Dedup.assignOf]] is
  * SLICING-INVARIANT (the verdict is record-local given the index — no
  * cross-arrival state), so the union of per-batch verdicts must equal
  * one batch run over all arrivals, under any micro-batch slicing, on the
  * REAL sf0.001 corpus index. Complementary to [[NearDupStreamSpec]]'s
  * keep-first WITHIN-stream contract.
  */
class DedupAssignStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-batch verdicts == one batch run, on the real index at sf0.001") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (ixSigs, ixBands) = graft.pipeline.Dedup.minhashIndex(spark, sf)
    val arrivals = graft.sources.Tables.table(spark, sf, "documents")
      .filter($"doc_id" % 2 === 1)
    val rows = arrivals.select($"doc_id", $"text")
      .as[(Long, String)].collect().toIndexedSeq

    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val mem = MemoryStream[(Long, String)]
    val q = DedupAssignStream.start(
      mem.toDF().toDF("doc_id", "text"), ixSigs, ixBands) { (batch, _) =>
      got ++= batch.collect().map(_.toSeq)
    }
    // deliberately uneven slicing: 3 batches of very different sizes
    val cuts = Seq(rows.take(3), rows.slice(3, 11), rows.drop(11))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    val want = graft.pipeline.Dedup.assignOf(arrivals, ixSigs, ixBands)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSet == want.toSet,
      s"streaming ${got.size} rows vs batch ${want.length}")
    // at least one arrival must be a near-dup reject for the pin to bite
    assert(want.exists(_.last == "reject_dup"),
      "fixture corpus should contain at least one cross-parity near-dup")
  }
}
