package graft.operators

import java.util.concurrent.{CompletableFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import AsyncEnrich.AsyncClient

/** Async external enrichment: ≡ the join it substitutes for, timeout →
  * fallback (not failure), in-flight bounded by capacity, LRU cache and
  * in-flight coalescing suppress duplicate lookups, ordered emission. */
class AsyncEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Instrumented fake store: counts lookups and tracks the in-flight
    * high-water mark; `slowKeys` never complete within any test timeout. */
  private final class Probe(
      m: Map[Long, String], delayMs: Long, slowKeys: Set[Long] = Set.empty)
    extends AsyncClient[Long, String] {
    val lookups = new AtomicInteger
    val inflight = new AtomicInteger
    val maxInflight = new AtomicInteger
    val closed = new AtomicInteger
    private val sched = java.util.concurrent.Executors.newScheduledThreadPool(4)
    override def lookup(key: Long): CompletableFuture[String] = {
      lookups.incrementAndGet()
      val cur = inflight.incrementAndGet()
      maxInflight.getAndUpdate(p => math.max(p, cur)): Unit
      val f = new CompletableFuture[String]()
      val d = if (slowKeys(key)) 3600000L else delayMs
      sched.schedule(new Runnable {
        override def run(): Unit = {
          inflight.decrementAndGet()
          m.get(key) match {
            case Some(v) => f.complete(v): Unit
            case None => f.completeExceptionally(new NoSuchElementException): Unit
          }
        }
      }, d, TimeUnit.MILLISECONDS)
      f
    }
    override def close(): Unit = { sched.shutdownNow(); closed.incrementAndGet(): Unit }
  }

  private val dim = (0L until 50L).map(k => k -> s"v$k").toMap

  private def drain(
      rows: Seq[Long], cl: Probe, timeoutMs: Long = 5000L,
      capacity: Int = 8, cacheSize: Int = 1000): Seq[(Long, Option[String])] =
    AsyncEnrich.enrichPartition[Long, Long, String, (Long, Option[String])](
      rows.iterator, identity, cl, timeoutMs, capacity, cacheSize,
      (k, v) => (k, v)).toSeq

  test("enrichment ≡ the lookup map, in input order") {
    val rows = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val out = drain(rows, new Probe(dim, 2))
    assert(out == rows.map(k => k -> Some(s"v$k")))
  }

  test("missing keys and timeouts yield None fallbacks, not failures; " +
    "other rows are unaffected") {
    val cl = new Probe(dim, 2, slowKeys = Set(7L))
    val out = drain(Seq(1L, 999L, 7L, 2L), cl, timeoutMs = 300)
    assert(out == Seq(
      1L -> Some("v1"), 999L -> None, 7L -> None, 2L -> Some("v2")))
  }

  test("in-flight concurrency is bounded by capacity") {
    val cl = new Probe(dim, 30)
    drain((0L until 50L).toSeq, cl, capacity = 4)
    assert(cl.maxInflight.get() <= 4,
      s"in-flight exceeded capacity: ${cl.maxInflight.get()}")
    assert(cl.closed.get() == 1, "client must be closed exactly once at drain end")
  }

  test("the LRU cache and in-flight coalescing suppress duplicate lookups") {
    val cl = new Probe(dim, 5)
    // 200 rows over 10 hot keys: ≤10 lookups total (cache after completion,
    // coalescing while in flight)
    val rows = (0 until 200).map(i => (i % 10).toLong)
    val out = drain(rows, cl, cacheSize = 100)
    assert(out.size == 200 && out.forall { case (k, v) => v.contains(s"v$k") })
    assert(cl.lookups.get() <= 10,
      s"expected ≤10 lookups over 10 distinct keys, got ${cl.lookups.get()}")
  }

  test("cacheSize bounds memory: evicted keys re-fetch") {
    val cl = new Probe(dim, 1)
    // alternating working set wider than the cache forces re-fetches but
    // never incorrect results
    val rows = (0 until 60).map(i => (i % 6).toLong)
    val out = drain(rows, cl, capacity = 1, cacheSize = 2)
    assert(out.forall { case (k, v) => v.contains(s"v$k") })
    assert(cl.lookups.get() > 6, "a 2-entry cache over 6 keys must re-fetch")
  }

  test("cache hits do not consume in-flight capacity: interleaved hot-key " +
    "rows keep the lookup pipeline at full depth") {
    val warm = Map(0L -> "w0", 1L -> "w1")
    val cold = (100L until 140L).map(k => k -> s"v$k").toMap
    val cl = new Probe(warm ++ cold, 20)
    // warm 2 keys (≤2 concurrent during warm-up), then alternate
    // hit/miss: with capacity=4, only the 4 cold PENDINGS may count
    // against capacity — the interleaved cache hits ride free, so the
    // in-flight high-water mark must reach the full 4 (counting hits
    // against capacity capped it at ~2 for this interleaving)
    val rows = Seq(0L, 1L) ++ (0 until 80).map(i =>
      if (i % 2 == 0) (i / 2 % 2).toLong else 100L + i / 2)
    val out = drain(rows, cl, capacity = 4, cacheSize = 1000)
    assert(out.forall(_._2.isDefined))
    assert(cl.maxInflight.get() >= 4,
      s"cache hits throttled the pipeline: high-water ${cl.maxInflight.get()} < 4")
    assert(cl.maxInflight.get() <= 4,
      s"in-flight exceeded capacity: ${cl.maxInflight.get()}")
  }

  test("a transient lookup failure yields the fallback for THAT row only — " +
    "it is not cached, so the next row for the key re-issues and succeeds") {
    val cl = new AsyncClient[Long, String] {
      val lookups = new AtomicInteger
      override def lookup(key: Long): CompletableFuture[String] = {
        val f = new CompletableFuture[String]()
        if (lookups.incrementAndGet() == 1)
          f.completeExceptionally(new RuntimeException("transient store error"))
        else f.complete(s"v$key"): Unit
        f
      }
    }
    // capacity=1 forces the first harvest before the second enqueue, so
    // the second row consults the cache rather than coalescing
    val out = AsyncEnrich.enrichPartition[Long, Long, String, (Long, Option[String])](
      Seq(7L, 7L).iterator, identity, cl, 5000L, 1, 1000, (k, v) => (k, v)).toSeq
    assert(out == Seq(7L -> None, 7L -> Some("v7")),
      s"transient failure must not poison the cache: $out")
    assert(cl.lookups.get() == 2)
  }

  test("a confirmed missing key (normal null completion) IS cached") {
    val cl = new AsyncClient[Long, String] {
      val lookups = new AtomicInteger
      override def lookup(key: Long): CompletableFuture[String] = {
        lookups.incrementAndGet()
        CompletableFuture.completedFuture(null)
      }
    }
    val out = AsyncEnrich.enrichPartition[Long, Long, String, (Long, Option[String])](
      Seq(7L, 7L).iterator, identity, cl, 5000L, 1, 1000, (k, v) => (k, v)).toSeq
    assert(out == Seq(7L -> None, 7L -> None))
    assert(cl.lookups.get() == 1,
      "a confirmed miss is a cacheable fact — the second row must not re-fetch")
  }

  test("coalesced rows share the original lookup's deadline (timeout runs " +
    "from SUBMISSION, not from each row's enqueue)") {
    // rows arrive 400 ms apart (slow upstream iterator); the slow key never
    // completes. Row 3 coalesces onto row 1's in-flight lookup ~800 ms
    // after its submission — sharing the submit timestamp, its residual
    // wait is ~0, so the drain finishes around t≈1600 ms. Re-stamping at
    // enqueue (the old bug) gave row 3 a fresh 1200 ms deadline from
    // t≈1200, stretching the drain to ~2400 ms. The 500 ms slack is over
    // sleeps and timed waits (which overshoot by scheduler ms, not the
    // multiples CPU-bound loops stretch by in contended windows), and the
    // lookup-count assert pins the coalescing itself clock-free.
    val cl = new Probe(dim, 2, slowKeys = Set(7L))
    val gapped = Seq(7L, 1L, 7L).iterator.map { k => Thread.sleep(400); k }
    val t0 = System.nanoTime()
    val out = AsyncEnrich.enrichPartition[Long, Long, String, (Long, Option[String])](
      gapped, identity, cl, 1200L, 4, 1000, (k, v) => (k, v)).toSeq
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out == Seq(7L -> None, 1L -> Some("v1"), 7L -> None))
    assert(cl.lookups.get() == 2, "the second slow-key row must coalesce")
    assert(elapsedMs < 2100,
      s"coalesced row waited past the shared deadline: ${elapsedMs}ms (shared " +
        "submit ⇒ ~1600ms; per-enqueue re-stamp ⇒ ~2400ms)")
  }

  test("streaming twin: foreachBatch enrichment is slicing-invariant — " +
    "micro-batched stream ≡ one batch run (the operator is record-local " +
    "given the store)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val keys = Seq(3L, 1L, 999L, 4L, 1L, 5L)
    // local copy: the task closure must not capture the (unserializable)
    // spec instance through the `dim` field
    val d = dim
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String)]())
    val input = MemoryStream[Long]
    val q = input.toDS()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Long], _: Long) =>
        AsyncEnrich.enrich(b, identity[Long],
            () => new AsyncEnrich.MapStoreClient(d, delayMs = 1))(
            (k, v) => (k, v.getOrElse("FALLBACK")))
          .collect().foreach(got.add)
        (): Unit
      }.outputMode("append").start()
    try {
      keys.grouped(2).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val batch = AsyncEnrich.enrich(spark.createDataset(keys), identity[Long],
        () => new AsyncEnrich.MapStoreClient(d, delayMs = 1))(
        (k, v) => (k, v.getOrElse("FALLBACK"))).collect().toSeq
    assert(got.asScala.toSeq.sorted == batch.sorted,
      s"streamed ≠ batch: ${got.asScala.toSeq.sorted} vs ${batch.sorted}")
    assert(batch.contains(999L -> "FALLBACK"), "missing key flows as fallback")
  }

  test("declared query: async enrichment over the real tables matches the " +
    "bulk join, including plan-level row counts") {
    val dir = "/root/testdata/sf0.001"
    val out = AsyncEnrich.enrichQuery(spark, dir).collect()
    val joined = {
      import spark.implicits._
      graft.sources.Tables.table(spark, dir, "customer").as("c")
        .join(graft.sources.Tables.table(spark, dir, "nation").as("n"),
          org.apache.spark.sql.functions.col("c.c_nationkey") ===
            org.apache.spark.sql.functions.col("n.n_nationkey"))
        .select($"c_custkey", $"c_name", $"n_name".as("nation_name"))
        .orderBy($"c_custkey").collect()
    }
    assert(out.length == joined.length && out.sameElements(joined),
      "async enrichment must equal the bulk join it substitutes for")
  }
}
