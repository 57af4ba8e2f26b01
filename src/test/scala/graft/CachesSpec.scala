package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Library cache hygiene (r8/r9 ADVICE): internal multi-branch caches
  * register in [[Caches]] and a single `Caches.clear()` releases them all —
  * a long-lived session running many queries accumulates NO graft blocks,
  * while the session owner's own caches are left untouched. Assertions are
  * per-dataset (`storageLevel`), not on the global persistent-RDD map,
  * because sbt runs suites in parallel on one shared session.
  */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("multi-query session: clear() releases every library cache") {
    val before = Caches.snapshot.toSet
    // three cache-heavy query families back to back, fully materialized
    graft.pipeline.Dedup.minhash(spark, sf).count()
    graft.pipeline.Winnowing.winnowPairs(spark, sf).count()
    graft.relational.Basket.basketPairs(spark, sf).count()
    val mine = Caches.snapshot.filterNot(before)
    assert(mine.nonEmpty, "queries should have registered caches")
    assert(mine.forall(_.storageLevel != StorageLevel.NONE),
      "registered caches should be persisted before the clear")
    Caches.clear()
    assert(mine.forall(_.storageLevel == StorageLevel.NONE),
      "clear() must unpersist every registered cache")
  }

  test("cached() is idempotent on the plan: one registration per shared plan") {
    import spark.implicits._
    val base = Seq(1L, 2L, 3L).toDF("x").filter($"x" > 1)
    Caches.cached(base)
    base.count()
    // a second entry point re-deriving the SAME plan must not re-register
    // (Spark would log "Asked to cache already cached data" and the
    // registry would hold a stale duplicate handle — r10 verdict #4).
    // Membership check, not a global count: other suites register in
    // parallel on the shared session.
    Caches.cached(Seq(1L, 2L, 3L).toDF("x").filter($"x" > 1))
    val plan = base.queryExecution.analyzed
    val mine = Caches.snapshot.filter(_.queryExecution.analyzed.sameResult(plan))
    assert(mine.size == 1,
      s"an equivalent plan must be registered exactly once, found ${mine.size}")
    base.unpersist(blocking = false)
  }

  test("materialize() registers exactly the checkpoint RDD backing its result") {
    import spark.implicits._
    // a foreign persist must never be captured: registration reads the
    // returned Dataset's own LogicalRDD, not a getPersistentRDDs diff
    // (r12 ADVICE — the diff could capture a concurrent thread's
    // checkpoint, and clearAll() would then deterministically kill it)
    val foreign = spark.sparkContext.range(0, 100).persist()
    foreign.count()
    try {
      val before = Caches.rddSnapshot.map(_.id).toSet
      val m = Caches.materialize(Seq(1L, 2L, 3L).toDF("x"))
      val lrRdd = m.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
      // loud pin: if a Spark upgrade stops exposing the checkpoint RDD as
      // a LogicalRDD leaf, materialize would silently leak its blocks
      assert(lrRdd.isDefined,
        "localCheckpoint result no longer a LogicalRDD — fix materialize()")
      val mine = Caches.rddSnapshot.filterNot(r => before(r.id))
      assert(mine.exists(_.id == lrRdd.get.id),
        "the checkpoint RDD backing the result must be registered")
      assert(!mine.exists(_.id == foreign.id),
        "a foreign RDD must never enter the registry")
      assert(m.count() == 3L)
    } finally foreign.unpersist(blocking = false)
  }

  test("clear() leaves the session owner's own caches alone") {
    import spark.implicits._
    val mine = Seq(1, 2, 3).toDF("x").cache()
    try {
      mine.count()
      graft.pipeline.Dedup.minhash(spark, sf).count()
      Caches.clear()
      assert(mine.storageLevel != StorageLevel.NONE,
        "the owner's own cache must survive a library clear")
    } finally mine.unpersist(blocking = false)
  }
}
