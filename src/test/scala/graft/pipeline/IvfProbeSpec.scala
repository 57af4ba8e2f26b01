package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IVF multi-cell probing: the declared query is oracle-gated at sf0.01; here
  * the RECALL claim that justifies nprobe is checked directly — against a
  * driver-side BigInt brute force, probing [[Similarity.IvfNprobe]] cells
  * must never recall fewer true neighbors than searching the query's own
  * cell alone, and the single-cell result must be a subset of the probed
  * candidate space (cells are ranked by the same argmin the assignment
  * uses, so probe #1 IS the own cell).
  */
class IvfProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def topk(rows: Array[(Long, Long)]): Map[Long, Seq[Long]] =
    rows.groupBy(_._1).map { case (q, ps) => (q, ps.map(_._2).toSeq) }

  test("nprobe recall >= single-cell recall against brute force") {
    import spark.implicits._
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"vec_id", Hashing.quantize($"embedding").as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val queries = e.filter(_._1 < Similarity.QueryVecs)
    // exact top-3 by integer dot, ties by vec_id — same order the plans use
    val exact: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      val top = e.filter(_._1 != qid)
        .map { case (vid, v) => (vid, qv.lazyZip(v).map(_ * _).sum) }
        .sortBy { case (vid, dot) => (-dot, vid) }
        .take(3).map(_._1).toSet
      (qid, top)
    }.toMap
    val single = topk(Similarity.annIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    val probed = topk(Similarity.annIvfProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    assert(probed.nonEmpty)
    exact.foreach { case (qid, truth) =>
      val rs = single.getOrElse(qid, Seq.empty).toSet.intersect(truth).size
      val rp = probed.getOrElse(qid, Seq.empty).toSet.intersect(truth).size
      assert(rp >= rs, s"query $qid: nprobe recall $rp < single-cell $rs")
    }
    // nprobe must actually widen the search somewhere at this SF (if every
    // query's top-3 already sat in its own cell the test would be vacuous)
    assert(exact.exists { case (qid, truth) =>
      probed.getOrElse(qid, Seq.empty).toSet.intersect(truth).size >
        single.getOrElse(qid, Seq.empty).toSet.intersect(truth).size
    } || exact.forall { case (qid, truth) =>
      single.getOrElse(qid, Seq.empty).toSet.intersect(truth).size == truth.size
    }, "nprobe neither improved any query nor was single-cell already perfect")
  }
}
