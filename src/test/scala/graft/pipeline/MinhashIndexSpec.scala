package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persisted-MinHash-index contract (the dedup twin of IvfIndexSpec):
  * an admission check served from the parquet-persisted signature/band
  * index must be bit-identical to one served from inline signature
  * computation, the serving plan must contain ZERO corpus signature
  * replay (no minhash expression over the corpus side — two parquet
  * scans only), and the registry must be STALENESS-KEYED: mutating the
  * source table rebuilds the index instead of silently serving the old
  * snapshot's artifact.
  */
class MinhashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("assign from the persisted index == inline signatures; no corpus replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mh_index").toString
    try {
      Dedup.writeMinhashIndex(spark, sf, dir)
      val ixSigs = spark.read.parquet(s"$dir/sigs")
      val ixBands = spark.read.parquet(s"$dir/bands")
      val arrivals = graft.sources.Tables.table(spark, sf, "documents")
        .filter($"doc_id" % 2 === 1)
      val served = Dedup.assignOf(arrivals, ixSigs, ixBands)
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(served.nonEmpty)
      // inline twin: the same assignment with corpus signatures and bands
      // computed in-plan instead of read from the artifact
      val corpus = graft.sources.Tables.table(spark, sf, "documents")
        .filter($"doc_id" % 2 === 0)
      val sg = Dedup.sigsOf(corpus)
      val inline = Dedup.assignOf(arrivals, sg, Dedup.bandsOf(sg))
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(served == inline,
        "index-served admission must be bit-identical to inline signatures")
      // and both must equal the registry-served declared query
      val declared = Dedup.assign(spark, sf).collect().map(_.toString).toSeq
      assert(declared == served)
      // zero corpus signature replay: exactly ONE rot_minhash site in the
      // serving plan — the batch-sized arrival side; the corpus side is
      // parquet scans of the index artifact
      val plan = Dedup.assignOf(arrivals, ixSigs, ixBands)
        .queryExecution.optimizedPlan.toString
      // the cached arrival projection prints once per reference; distinct
      // lines pin ONE unique signature site (the arrival side)
      val sigSites = plan.split("\n")
        .flatMap(l => "rot_minhash.*".r.findFirstIn(l)).toSet
      assert(sigSites.size == 1,
        s"exactly one (arrival-side) signature site expected, got ${sigSites.size} in:\n$plan")
      val ixScans = plan.split("\n").count(l =>
        l.contains("Relation") && l.contains("parquet"))
      assert(ixScans >= 2, s"expected index parquet scans in:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("index refresh: out-of-distribution arrivals flip the verdict to rebuild") {
    import spark.implicits._
    val (ixSigs, ixBands) = Dedup.minhashIndex(spark, sf)
    // in-distribution: verbatim copies of indexed corpus docs — every band
    // key is in the index, novelty 0, verdict keep (and all rejected)
    val corpusCopy = graft.sources.Tables.table(spark, sf, "documents")
      .filter($"doc_id" % 2 === 0).limit(20)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        lit("known").as("source"), $"text")
    val keep = Dedup.dedupIndexRefreshOf(corpusCopy, ixSigs, ixBands).collect()
    assert(keep.length == 1 && keep.head.getString(4) == "keep"
      && keep.head.getLong(3) == 0L && keep.head.getLong(2) == 20L,
      s"verbatim copies should be all-reject / zero-novelty keep: ${keep.toSeq}")
    // out-of-distribution: vocabulary the index never saw — every band key
    // missing, novelty 10000 bp, verdict rebuild
    val alien = (1 to 20).map(i =>
      (2000000L + i, "alien", s"zqx$i vbn$i plm$i wry$i kdf$i hjt$i gps$i " +
        s"mzv$i qwe$i rty$i uio$i asd$i fgh$i jkl$i zxc$i"))
      .toDF("doc_id", "source", "text")
    val rebuild = Dedup.dedupIndexRefreshOf(alien, ixSigs, ixBands).collect()
    assert(rebuild.length == 1 && rebuild.head.getString(4) == "rebuild"
      && rebuild.head.getLong(3) == 10000L,
      s"alien arrivals should be full-novelty rebuild: ${rebuild.toSeq}")
  }

  test("registry is staleness-keyed: a mutated source table rebuilds") {
    // copy the documents table to a writable dir so it can be mutated
    val data = java.nio.file.Files.createTempDirectory("mh_stale").toString
    val src = new java.io.File(s"$sf/documents.parquet")
    val dst = new java.io.File(s"$data/documents.parquet")
    if (src.isDirectory)
      org.apache.commons.io.FileUtils.copyDirectory(src, dst)
    else org.apache.commons.io.FileUtils.copyFile(src, dst)
    try {
      val p1 = Dedup.minhashIndexPath(spark, data)
      val p2 = Dedup.minhashIndexPath(spark, data)
      assert(p1 == p2, "unchanged table must serve the same artifact")
      // mutate: touch the table's mtime forward (content unchanged — the
      // fingerprint is name:length:mtime, mirroring IndexStore)
      val t = System.currentTimeMillis() + 5000
      val targets = if (dst.isDirectory) dst.listFiles().toSeq else Seq(dst)
      targets.foreach(f => assert(f.setLastModified(t)))
      val p3 = Dedup.minhashIndexPath(spark, data)
      assert(p3 != p1,
        "a mutated source table must rebuild instead of serving the old index")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(data))
    }
  }
}
