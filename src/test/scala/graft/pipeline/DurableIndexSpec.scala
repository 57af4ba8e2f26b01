package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DURABLE index-artifact tier (r12 verdict #1): with
  * `spark.graft.index.root` set, an index built in one session is REOPENED
  * by a later session — fresh process, empty in-process registry — with
  * ZERO build work: no training, no corpus hashing, not even a Spark job
  * (the open is a fingerprint-marker read). The cross-session scenario is
  * simulated without forking a JVM by re-keying the in-process registry:
  * the memo key includes the DATA DIR path, so a timestamp-preserving copy
  * of the source table (identical fingerprint, different path) is a
  * registry MISS that must resolve through the durable tier alone — the
  * throwing build thunk proves no build can have run. Staleness keeps its
  * contract: a mutated source table changes the fingerprint, hence the
  * artifact directory name, hence REBUILDS.
  *
  * The conf is session-scoped (read per access through the passed
  * session), so the spec runs in a `newSession()` and the shared test
  * session's process-local tier is untouched.
  */
class DurableIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Timestamp-preserving copy of `table.parquet` from `from` into a fresh
    * temp dir — same fingerprint, different registry key. */
  private def copyTable(from: String, table: String): String = {
    val out = java.nio.file.Files.createTempDirectory("durable_ix_data").toString
    val src = new java.io.File(s"$from/$table.parquet")
    val dst = new java.io.File(s"$out/$table.parquet")
    if (src.isDirectory)
      org.apache.commons.io.FileUtils.copyDirectory(src, dst) // preserves dates
    else org.apache.commons.io.FileUtils.copyFile(src, dst)
    out
  }

  test("MinHash index: second session reopens the durable artifact with " +
    "zero builds; mutation still rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("durable_ix_root").toString
    val s2 = spark.newSession()
    s2.conf.set(IndexStore.RootConf, root)
    import s2.implicits._
    val dataA = copyTable(sf, "documents")
    val dataB = copyTable(dataA, "documents")
    val dataC = copyTable(dataA, "documents")
    try {
      assert(IndexStore.fingerprint(s2, dataA, "documents") ==
        IndexStore.fingerprint(s2, dataB, "documents"),
        "timestamp-preserving copy must fingerprint identically")
      val b0 = IndexStore.durableBuilds.get()
      // session 1: build — lands under the durable root, marker stamped
      val p1 = Dedup.minhashIndexPath(s2, dataA)
      assert(p1.contains(root), s"durable artifact must live under $root: $p1")
      assert(IndexStore.durableBuilds.get() == b0 + 1)
      assert(new java.io.File(
        new org.apache.hadoop.fs.Path(p1, IndexStore.FpMarker).toUri.getPath)
        .exists(), "publish marker must be stamped")
      assert(!new java.io.File(root).listFiles().exists(_.getName.startsWith(".tmp-")),
        "no staging dirs may survive a successful publish")
      val (s1a, b1a) = Dedup.openMinhashIndex(s2, p1)
      val served1 = Dedup.assignOf(
          graft.sources.Tables.table(s2, dataA, "documents")
            .filter($"doc_id" % 2 === 1), s1a, b1a)
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      // "session 2": different data-dir path = registry miss; the durable
      // tier must serve the SAME artifact without building
      val p2 = Dedup.minhashIndexPath(s2, dataB)
      assert(p2 == p1, "matching fingerprint must reopen, not rebuild")
      assert(IndexStore.durableBuilds.get() == b0 + 1, "reopen ran a build")
      // and the strong form: a thunk that cannot build still resolves
      val p3 = IndexStore.getOrBuild(s2, dataC, "documents", "mh")(_ =>
        fail("durable reopen must not invoke the build thunk"))
      assert(p3 == p1)
      val (s2a, b2a) = Dedup.openMinhashIndex(s2, p2)
      val served2 = Dedup.assignOf(
          graft.sources.Tables.table(s2, dataB, "documents")
            .filter($"doc_id" % 2 === 1), s2a, b2a)
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(served1.nonEmpty && served2 == served1,
        "reopened serving must be bit-identical")
      // staleness: mutate dataB's mtimes forward → new fingerprint → rebuild
      val t = System.currentTimeMillis() + 7000
      val tbl = new java.io.File(s"$dataB/documents.parquet")
      val targets = if (tbl.isDirectory) tbl.listFiles().toSeq else Seq(tbl)
      targets.foreach(f => assert(f.setLastModified(t)))
      val p4 = Dedup.minhashIndexPath(s2, dataB)
      assert(p4 != p1, "a mutated source table must rebuild")
      assert(IndexStore.durableBuilds.get() == b0 + 2)
    } finally {
      Seq(root, dataA, dataB, dataC).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("IVF index: durable reopen without retraining") {
    val root = java.nio.file.Files.createTempDirectory("durable_ivf_root").toString
    val s2 = spark.newSession()
    s2.conf.set(IndexStore.RootConf, root)
    val dataA = copyTable(sf, "embeddings")
    val dataB = copyTable(dataA, "embeddings")
    try {
      val b0 = IndexStore.durableBuilds.get()
      Similarity.trainIndex(s2, dataA)
      assert(IndexStore.durableBuilds.get() == b0 + 1)
      val (c1, l1) = Similarity.ivfModel(s2, dataA)
      // fresh registry key, same fingerprint: the k-means must NOT rerun
      val p = IndexStore.getOrBuild(
        s2, dataB, "embeddings", s"ivf-${Similarity.IvfK}")(_ =>
        fail("durable reopen must not retrain"))
      assert(IndexStore.durableBuilds.get() == b0 + 1)
      val (c2, l2) = Similarity.openIvfIndex(s2, p)
      assert(c2.collect().map(_.toString).sorted.toSeq ==
        c1.collect().map(_.toString).sorted.toSeq,
        "reopened centroids must be the published model")
      assert(l1.count() == l2.count())
    } finally {
      Seq(root, dataA, dataB).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
