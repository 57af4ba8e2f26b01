package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.TextAnalysis

/** Streaming incremental classifier refresh: labeled arrival batches fold
  * into a running count table and the frozen weights after ANY slicing
  * must equal a full [[TextAnalysis.classifierFitOf]] over the union of
  * everything folded so far — on the REAL sf0.001 corpus, seeded both
  * empty (from-scratch online fit) and from a base slice's counts (the
  * snapshot-artifact refresh shape). State is ≤ ClfBuckets rows by
  * construction, bounded by the feature space, never the stream.
  */
class ClassifierMergeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def weightsOf(docs: org.apache.spark.sql.DataFrame): Seq[Long] =
    TextAnalysis.fitWeightArrayOf(TextAnalysis.classifierFitOf(docs))

  test("running weights after uneven slicing == full fit over the union, " +
    "from-scratch seed, on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val rows = docs.select($"lang", $"text")
      .as[(String, String)].collect().toIndexedSeq

    val empty = Seq.empty[(Long, Long, Long)]
      .toDF("bucket", "n_pos", "n_neg")
    val state = new ClassifierMergeStream.ClfModelState(empty)
    var folds = 0
    val mem = MemoryStream[(String, String)]
    val q = ClassifierMergeStream.start(
      mem.toDF().toDF("lang", "text"), state) { (_, _) => folds += 1 }
    // deliberately uneven slicing
    val cuts = Seq(rows.take(2), rows.slice(2, 9), rows.drop(9))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    assert(folds == cuts.count(_.nonEmpty))
    assert(state.weights == weightsOf(docs),
      "streamed folds must freeze to the full-corpus fit")
    // bounded-state contract: the running table never exceeds the
    // feature-hash space
    assert(state.counts.count() <= TextAnalysis.ClfBuckets)
  }

  test("seeded from a base slice's counts, folding the rest == full fit " +
    "(the snapshot-artifact refresh shape)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val base = docs.filter($"doc_id" % 3 =!= 0)
    val arrivals = docs.filter($"doc_id" % 3 === 0)
      .select($"lang", $"text").as[(String, String)].collect().toIndexedSeq

    val state = new ClassifierMergeStream.ClfModelState(
      TextAnalysis.clfCountsOf(base))
    val mem = MemoryStream[(String, String)]
    val q = ClassifierMergeStream.start(
      mem.toDF().toDF("lang", "text"), state) { (_, _) => () }
    val cuts = Seq(arrivals.take(1), arrivals.drop(1))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    assert(state.weights == weightsOf(docs),
      "artifact-seeded streamed refresh must equal a full retrain")
  }
}
