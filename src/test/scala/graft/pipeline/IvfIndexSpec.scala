package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted-IVF-index contract: build once, serve many. A probe query
  * answered from the parquet-persisted model must be bit-identical to one
  * answered from the inline model (same centroids, same cells, same
  * deterministic tie rules) — and the persisted path's lineage is two
  * parquet scans, never a k-means replay.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("probe query from the persisted index == inline model") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    try {
      Similarity.writeIvfIndex(spark, sf, dir)
      val fresh = Similarity.annIvfProbe(spark, sf)
        .collect().map(_.toString).toSeq
      val fromIndex = Similarity.annIvfProbeFromIndex(spark, dir)
        .collect().map(_.toString).toSeq
      assert(fresh.nonEmpty && fromIndex == fresh)
      // the persisted-path plan replays no k-means: the inline model's
      // centroid-update steps posexplode every vector per iteration, so a
      // posexplode (or the quantize of the raw embeddings table) in this
      // plan means training leaked into the serving path
      val plan = Similarity.annIvfProbeFromIndex(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("posexplode"), s"k-means replay in:\n$plan")
      val scans = plan.split("\n").count(_.contains("Relation"))
      assert(scans >= 2, s"expected parquet scans in:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("merged index makes arrivals searchable; snapshot-only serving cannot") {
    import spark.implicits._
    val merged = Similarity.ivfIndexMerge(spark, sf).collect()
    assert(merged.length == Similarity.QueryVecs * 3)
    // the point of the merge: at least one top-3 result IS an arrival
    // (vec_id >= the snapshot floor), which no snapshot-only index can
    // return because its cell table simply does not contain those rows
    val arrivalHits = merged.count(_.getLong(2) >= Similarity.IvfSnapshotFloor)
    assert(arrivalHits > 0,
      s"merged serving returned no arrivals: ${merged.toSeq}")
    // deterministic across invocations (frozen centroids, exact integers)
    val again = Similarity.ivfIndexMerge(spark, sf).collect()
    assert(merged.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
