package graft.operators

import java.util.concurrent.{CompletableFuture, TimeUnit}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** ASYNC EXTERNAL ENRICHMENT — the Flink `AsyncFunction` /
  * `AsyncDataStream.orderedWait` idiom: per-record lookups against an
  * external point-lookup store (KV service, REST endpoint, feature store)
  * with bounded in-flight concurrency, per-request timeout with a
  * fallback, an LRU result cache, and in-flight request coalescing.
  *
  * WHEN TO USE — and when not to: if the dimension can be bulk-read, USE
  * A JOIN (broadcast or shuffled — Catalyst optimizes it, this operator
  * cannot). The async path exists for stores a table scan cannot reach:
  * rate-limited APIs, per-key authorization, stores with no snapshot
  * export. That is genuinely imperative per-record I/O, which is exactly
  * the documented `mapPartitions` last-resort case — each partition runs
  * an async request pipeline so lookup latency overlaps across
  * up to `capacity` in-flight requests
  * instead of serializing row-by-row (the naive UDF shape: one blocked
  * task thread per lookup).
  *
  * Emission is ORDERED (input order preserved): in a batch engine,
  * downstream operators are set-oriented, so Flink's `unorderedWait`
  * latency optimization buys nothing here — with `capacity` requests
  * pipelined, head-of-line waiting costs no throughput, and ordered
  * emission keeps the operator deterministic.
  *
  * Timeout semantics: a lookup that has not completed `timeoutMs` after
  * SUBMISSION yields `None` to `combine` (enrich-with-fallback), not a
  * job failure — the curation-pipeline contract (a missing enrichment is
  * a row-level data-quality fact, not an infrastructure error). A
  * timed-out lookup is dropped entirely (a later row for the key
  * re-issues it): keeping it registered would grow per-task state with
  * every distinct key exactly when the store is slow or down.
  *
  * Scale: one client per PARTITION (built by the serializable `client`
  * factory — connections do not serialize), in-flight bounded by
  * `capacity`, cache bounded by `cacheSize` — executor memory per task is
  * O(capacity + cacheSize), independent of partition size. Works
  * unchanged inside `foreachBatch` for streaming micro-batch enrichment;
  * per-batch replay is slicing-invariant because the operator is
  * record-local given the store.
  */
object AsyncEnrich {

  /** The external store's async point-lookup surface. `lookup` must be
    * non-blocking (return immediately, complete later). Missing-key vs
    * error signaling is CACHING-relevant: complete with null for a
    * CONFIRMED missing key (reaches `combine` as `None` and is cached, so
    * a missing hot key costs one lookup); fail the future for a TRANSIENT
    * error (also `None`, but NOT cached — the next row for the key
    * re-issues). A client that signals permanent misses exceptionally
    * still gets correct fallbacks but re-fetches the missing key per row —
    * the wrong shape against a rate-limited store. */
  trait AsyncClient[K, V] {
    def lookup(key: K): CompletableFuture[V]

    /** Release connections; called once per partition at drain end. */
    def close(): Unit = ()
  }

  /** Enrich `ds` by an async per-record lookup on `keyFn`.
    *
    * @param client    per-partition client factory (must be serializable;
    *                  the CLIENT it builds need not be)
    * @param timeoutMs per-lookup deadline from submission; expiry → None
    * @param capacity  max in-flight lookups per partition
    * @param cacheSize LRU entries per partition (keys repeat in real
    *                  corpora: hot entities dominate lookups)
    * @param combine   row + lookup result (None = missing/timeout/error)
    */
  def enrich[T, K, V, O: Encoder](
      ds: Dataset[T],
      keyFn: T => K,
      client: () => AsyncClient[K, V],
      timeoutMs: Long = 10000L,
      capacity: Int = 64,
      cacheSize: Int = 10000)(
      combine: (T, Option[V]) => O): Dataset[O] = {
    require(capacity > 0 && cacheSize >= 0 && timeoutMs > 0)
    ds.mapPartitions { it =>
      val cl = client()
      // close-once wrapper + task-completion hook: the drain-end close
      // never runs when a downstream limit/take or an exception abandons
      // the iterator mid-partition — for a real client (connections,
      // thread pools) that leaked one client per task for the executor's
      // lifetime. The listener closes unconditionally at task end; the
      // AtomicBoolean keeps the two paths from double-closing.
      val closedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
      val once = new AsyncClient[K, V] {
        override def lookup(key: K): CompletableFuture[V] = cl.lookup(key)
        override def close(): Unit =
          if (closedOnce.compareAndSet(false, true)) cl.close()
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => once.close()))
      enrichPartition(it, keyFn, once, timeoutMs, capacity, cacheSize, combine)
    }
  }

  /** The per-partition pipeline — package-private for direct unit tests. */
  private[operators] def enrichPartition[T, K, V, O](
      it: Iterator[T],
      keyFn: T => K,
      cl: AsyncClient[K, V],
      timeoutMs: Long,
      capacity: Int,
      cacheSize: Int,
      combine: (T, Option[V]) => O): Iterator[O] = {
    // LRU over COMPLETED lookups (access-ordered)
    val cache = new java.util.LinkedHashMap[K, Option[V]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[K, Option[V]]): Boolean = size() > cacheSize
    }
    // key → (in-flight future, submit time): a second row for a key already
    // in flight COALESCES onto the same request instead of issuing a
    // duplicate — and SHARES its submit timestamp, so every row riding one
    // lookup sees the same deadline ("timeoutMs from SUBMISSION", not from
    // each row's enqueue; re-stamping at enqueue let a coalesced row wait
    // up to ~2x the timeout)
    final case class InFlight(f: CompletableFuture[V], submitNs: Long)
    val inflight = new java.util.HashMap[K, InFlight]()
    final case class Pending(row: T, key: K, f: CompletableFuture[V], submitNs: Long)
    val window = new scala.collection.mutable.Queue[Either[(T, Option[V]), Pending]]()
    // Only PENDING entries count against `capacity` — a cache hit costs no
    // in-flight slot, so interleaved hot-key rows don't shrink the lookup
    // pipeline depth. The window itself is still bounded (2*capacity) so a
    // long run of cache hits can't grow task memory past O(capacity).
    var pendingCount = 0

    new Iterator[O] {
      private var closed = false

      private def fill(): Unit =
        while (it.hasNext && pendingCount < capacity &&
            window.size < 2 * capacity) {
          val row = it.next()
          val k = keyFn(row)
          if (cache.containsKey(k)) window += Left((row, cache.get(k)))
          else {
            val (f, t0) = inflight.get(k) match {
              case null =>
                val nf = cl.lookup(k)
                val t = System.nanoTime()
                inflight.put(k, InFlight(nf, t))
                (nf, t)
              case existing => (existing.f, existing.submitNs)
            }
            pendingCount += 1
            window += Right(Pending(row, k, f, t0))
          }
        }

      override def hasNext: Boolean = {
        fill()
        val more = window.nonEmpty
        if (!more && !closed) { closed = true; cl.close() }
        more
      }

      override def next(): O = {
        if (!hasNext) throw new NoSuchElementException
        window.dequeue() match {
          case Left((row, v)) => combine(row, v)
          case Right(Pending(row, k, f, t0)) =>
            pendingCount -= 1
            val remainingMs =
              timeoutMs - (System.nanoTime() - t0) / 1000000L
            val v: Option[V] =
              try Option(f.get(math.max(0L, remainingMs), TimeUnit.MILLISECONDS))
              catch { case _: Exception => None }
            // whether completed, failed, or timed out: the registration is
            // dropped (keeping a timed-out future for a later same-key
            // harvest would pin a (key, future) entry per distinct key
            // exactly when the store is slow or down — per-task memory
            // would grow with partition size instead of staying
            // O(capacity + cacheSize); a later row simply re-issues)
            inflight.get(k) match {
              case reg if reg != null && (reg.f eq f) => inflight.remove(k): Unit
              case _ =>
            }
            // cache only NORMAL completions — a value, or a confirmed
            // missing-key null. An exceptional completion (transient store
            // error) yields the fallback for THIS row but is NOT cached:
            // caching it would turn one transient failure into the fallback
            // for every later row of that key until LRU eviction, a far
            // broader blast radius than the per-request contract. Cache the
            // future's OWN value, not `v`: a lookup that completes in the
            // race window between the timed-out get and the isDone check
            // must cache the real value (this row still gets the fallback —
            // its deadline passed — but later rows must not inherit a
            // spurious permanent miss).
            if (f.isDone && !f.isCompletedExceptionally)
              cache.put(k, Option(f.getNow(null.asInstanceOf[V])))
            combine(row, v)
        }
      }
    }
  }

  /** A genuinely ASYNC store stub over an in-memory map: lookups complete
    * on a scheduler thread after `delayMs` — the deterministic stand-in
    * for the external KV service this container cannot reach (the
    * multimodal-codec stub convention: the Spark-side machinery is real
    * and tested; only the wire is faked). Shared by the declared query
    * and the spec fixtures. */
  final class MapStoreClient[K, V](m: Map[K, V], delayMs: Long)
    extends AsyncClient[K, V] {
    // daemon threads: an abandoned partition iterator (downstream limit)
    // must not pin the executor JVM on unclosed scheduler threads
    private val sched = java.util.concurrent.Executors.newScheduledThreadPool(
      2, (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    override def lookup(key: K): CompletableFuture[V] = {
      val f = new CompletableFuture[V]()
      sched.schedule(new Runnable {
        // a map miss is a CONFIRMED missing key → null completion (the
        // cacheable-miss convention of the AsyncClient contract), not an
        // exceptional one (which signals a transient, uncacheable error)
        override def run(): Unit =
          f.complete(m.getOrElse(key, null.asInstanceOf[V])): Unit
      }, delayMs, TimeUnit.MILLISECONDS)
      f
    }
    override def close(): Unit = sched.shutdown()
  }

  /** Declared query: every customer enriched with its nation name through
    * the ASYNC pipeline — the store is the 25-row nation table exposed
    * point-lookup-only through [[MapStoreClient]] (collected once on the
    * driver: catalog-bounded, the broadcast-dim convention). The DuckDB
    * oracle is the equivalent bulk JOIN, so hash equality pins the async
    * path ≡ the join it substitutes for — the exact contract a user
    * migrating a Flink AsyncFunction needs. */
  def enrichQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = graft.sources.Tables.table(s, dir, "nation")
      .select($"n_nationkey".cast("long"), $"n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cust = graft.sources.Tables.table(s, dir, "customer")
      .select($"c_custkey".cast("long"), $"c_name", $"c_nationkey".cast("long"))
      .as[(Long, String, Long)]
    // timeout = a day, NOT the 10 s default: the correctness gate must be
    // deterministic, and a mere driver/executor stall (GC pause, host
    // contention) at the default would flip rows to the fallback and
    // hash-mismatch the oracle's inner join on a run that is only slow —
    // timeout-fallback SEMANTICS are pinned in AsyncEnrichSpec instead
    enrich(cust, (c: (Long, String, Long)) => c._3,
        () => new MapStoreClient(nations, delayMs = 1),
        timeoutMs = 86400000L, capacity = 32)(
        (c, v) => (c._1, c._2, v.getOrElse("MISSING")))
      .toDF("c_custkey", "c_name", "nation_name")
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_async_enrich" -> (enrichQuery _))

  val oracles: Map[String, String] = Map(
    "q_async_enrich" ->
      """SELECT c_custkey, c_name, n_name AS nation_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin)
}
