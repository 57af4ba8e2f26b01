package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Durable-artifact GC (r15, r14 verdict #1): a mutated corpus publishes a
  * NEW `variant-fp<hash>` dir and the superseded one — plus any
  * crash-orphaned `.tmp-*` staging dir — lived forever; at
  * one-snapshot-per-day cadence that is unbounded storage creep on the
  * serving tier. [[IndexRetention.gc]] removes exactly the dirs no current
  * session can resolve, and nothing else:
  *
  *  - superseded fp dirs (name hash matches no live fingerprint) go;
  *  - `.tmp-*` orphans OLDER than the safety window go; younger ones stay
  *    (a build may be in flight — concurrent-publish safety);
  *  - the live published artifact stays, and a second session's
  *    `durableGetOrBuild` is still ZERO-build after GC;
  *  - live-named dirs with a missing publish marker (crashed non-atomic
  *    publish) go only past the safety window;
  *  - names this store never created are never touched.
  */
class IndexRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Timestamp-preserving copy of `table.parquet` (DurableIndexSpec's
    * fixture): same fingerprint, different registry key. */
  private def copyTable(from: String, table: String): String = {
    val out = java.nio.file.Files.createTempDirectory("ix_gc_data").toString
    val src = new java.io.File(s"$from/$table.parquet")
    val dst = new java.io.File(s"$out/$table.parquet")
    if (src.isDirectory)
      org.apache.commons.io.FileUtils.copyDirectory(src, dst)
    else org.apache.commons.io.FileUtils.copyFile(src, dst)
    out
  }

  private def mkDir(root: String, name: String, ageMs: Long = 0L,
      marker: Option[String] = None): java.io.File = {
    val d = new java.io.File(root, name)
    assert(d.mkdirs())
    val payload = new java.io.File(d, "part-000.parquet")
    java.nio.file.Files.writeString(payload.toPath, "payload")
    marker.foreach(fp => java.nio.file.Files.writeString(
      new java.io.File(d, IndexStore.FpMarker).toPath, fp))
    if (ageMs > 0) {
      val t = System.currentTimeMillis() - ageMs
      assert(d.setLastModified(t))
    }
    d
  }

  test("gc removes superseded fp dirs and old tmp orphans; keeps the live " +
    "artifact (still zero-build after), young tmps, and foreign files") {
    val root = java.nio.file.Files.createTempDirectory("ix_gc_root").toString
    val s2 = spark.newSession()
    s2.conf.set(IndexStore.RootConf, root)
    val dataA = copyTable(sf, "documents")
    val dataB = copyTable(dataA, "documents")
    try {
      // live artifact: a real durable publish for the documents corpus
      val liveDir = Dedup.minhashIndexPath(s2, dataA)
      assert(liveDir.contains(root))
      val ttl = IndexStore.DefaultTmpTtlMs
      // superseded fingerprint (fake hash ≠ any live), past the safety
      // window — collected; a YOUNG non-live dir is kept (it may be a
      // fresh publish for a corpus that mutated after gc snapshotted the
      // live fingerprints — the mutation-during-gc race)
      val stale = mkDir(root, "mh-fp" + "0" * 32, ageMs = ttl + 60000,
        marker = Some("some-old-fingerprint"))
      val youngStale = mkDir(root, "mh-fp" + "1" * 32,
        marker = Some("a-just-published-newer-fingerprint"))
      // crash-orphaned staging dirs: one past the TTL, one in flight
      val oldTmp = mkDir(root, ".tmp-mh-abc-deadbeef", ageMs = ttl + 60000)
      val youngTmp = mkDir(root, ".tmp-mh-abc-12345678")
      // crashed NON-ATOMIC publish: live-looking name but no marker
      val liveHash = new java.io.File(liveDir).getName
        .replaceFirst("^.*-fp", "")
      val crashedOld = mkDir(root, "other-fp" + liveHash, ageMs = ttl + 60000)
      val crashedYoung = mkDir(root, "other2-fp" + liveHash)
      // a file this store never created
      val foreign = new java.io.File(root, "README.txt")
      java.nio.file.Files.writeString(foreign.toPath, "not ours")

      val report = IndexRetention.gc(s2, root, Seq(dataA -> "documents"))

      assert(!stale.exists(), "superseded fp dir must be removed")
      assert(youngStale.exists(),
        "a young non-live dir may be a mid-gc mutation's fresh publish — kept")
      assert(!oldTmp.exists(), "past-TTL staging orphan must be removed")
      assert(youngTmp.exists(), "in-flight staging dir must be kept")
      assert(!crashedOld.exists(),
        "past-TTL unpublished live-named dir (crashed publish) must be removed")
      assert(crashedYoung.exists(),
        "young unpublished live-named dir may be a landing publish — kept")
      assert(new java.io.File(liveDir).exists(), "live artifact must survive")
      assert(foreign.exists(), "gc must never touch names it didn't create")
      assert(report.removedStale.map(new java.io.File(_).getName) ==
        Seq(stale.getName))
      assert(report.removedOrphans.map(new java.io.File(_).getName).sorted ==
        Seq(crashedOld.getName, oldTmp.getName).sorted)
      assert(report.kept.exists(_.endsWith(new java.io.File(liveDir).getName)))

      // the serving contract survives GC: a fresh registry key (different
      // data-dir path, identical fingerprint) reopens with ZERO builds
      val b0 = IndexStore.durableBuilds.get()
      val reopened = IndexStore.getOrBuild(s2, dataB, "documents", "mh")(_ =>
        fail("post-GC reopen must not rebuild"))
      assert(reopened == liveDir)
      assert(IndexStore.durableBuilds.get() == b0,
        "durableBuilds must stay flat across GC + reopen")
    } finally {
      Seq(root, dataA, dataB).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("gc on a missing or empty root is a no-op, not an error") {
    val report = IndexRetention.gc(
      spark, "/tmp/ix_gc_nonexistent_" + System.nanoTime(), Seq.empty)
    assert(report.removedStale.isEmpty && report.removedOrphans.isEmpty &&
      report.kept.isEmpty)
  }

  test("gc ABORTS when a live table cannot be fingerprinted — a fallback " +
    "key would reclassify the serving artifact as stale and delete it") {
    val root = java.nio.file.Files.createTempDirectory("ix_gc_root3").toString
    try {
      val survivor = mkDir(root, "mh-fp" + "2" * 32,
        ageMs = IndexStore.DefaultTmpTtlMs + 60000)
      val e = intercept[java.io.IOException] {
        IndexRetention.gc(spark, root,
          Seq("/tmp/ix_gc_missing_table_dir" -> "documents"))
      }
      assert(e.getMessage.contains("aborted"))
      assert(survivor.exists(), "an aborted gc must delete NOTHING")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root))
  }

  test("a corpus MUTATION then gc: the new artifact is live, the " +
    "superseded one is collected") {
    val root = java.nio.file.Files.createTempDirectory("ix_gc_root2").toString
    val s2 = spark.newSession()
    s2.conf.set(IndexStore.RootConf, root)
    val data = copyTable(sf, "documents")
    try {
      val v1 = Dedup.minhashIndexPath(s2, data)
      // mutate: bump mtimes forward → new fingerprint → new publish dir
      val t = System.currentTimeMillis() + 9000
      val tbl = new java.io.File(s"$data/documents.parquet")
      val targets = if (tbl.isDirectory) tbl.listFiles().toSeq else Seq(tbl)
      targets.foreach(f => assert(f.setLastModified(t)))
      val v2 = Dedup.minhashIndexPath(s2, data)
      assert(v2 != v1)
      assert(new java.io.File(v1).exists() && new java.io.File(v2).exists())
      // age the superseded snapshot past the safety window (a fresh one is
      // kept until the next gc — the mutation-during-gc race guard)
      assert(new java.io.File(v1).setLastModified(
        System.currentTimeMillis() - IndexStore.DefaultTmpTtlMs - 60000))
      val report = IndexRetention.gc(s2, root, Seq(data -> "documents"))
      assert(!new java.io.File(v1).exists(), "superseded snapshot collected")
      assert(new java.io.File(v2).exists(), "current snapshot serves on")
      assert(report.removedStale.map(new java.io.File(_).getName) ==
        Seq(new java.io.File(v1).getName))
    } finally {
      Seq(root, data).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
