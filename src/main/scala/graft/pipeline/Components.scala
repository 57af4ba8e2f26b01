package graft.pipeline

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
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._

    def canon(e: DataFrame): DataFrame =
      e.filter($"u" =!= $"v")
        .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .distinct()

    // (count, hash-xor) fingerprint: one tiny action per round, used only
    // to decide termination. XOR (not sum) so ANSI mode can't overflow.
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

    // Checkpoint (not cache) each round: an iterative DataFrame loop
    // doubles its logical plan per round — by round ~8 the PLAN alone OOMs
    // the driver. Checkpointing truncates lineage to the materialized RDD,
    // keeping every round's plan constant-size. With a checkpoint dir
    // configured (cluster deployment) rounds are reliably checkpointed and
    // survive executor loss; without one (local/test) localCheckpoint keeps
    // the truncation but stores blocks on executors. Lazy (eager = false):
    // the fingerprint aggregate right after is the materializing action, so
    // each round costs ONE Spark job, not two — per-round latency, not data
    // volume, dominates on small/converged graphs.
    val ckpt: DataFrame => DataFrame =
      if (s.sparkContext.getCheckpointDir.isDefined) _.checkpoint(eager = false)
      else _.localCheckpoint(eager = false)
    var edges = ckpt(canon(pairs.toDF("u", "v")))
    var fp = fingerprint(edges)
    var converged = false
    var round = 0
    while (!converged && round < MaxRounds) {
      val next = ckpt(canon(smallStar(largeStar(edges))))
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds star rounds")

    // Fixed point is a star forest with u > v = component min: children map
    // to their root, roots map to themselves. Nodes whose ONLY appearance is
    // a self-loop never survive canon(), so union them back as singleton
    // candidates; the min-per-node aggregate (same one shuffle the old
    // distinct() cost, now map-side combinable) keeps the real root when the
    // node also has proper edges (root ≤ node always).
    val selfRoots = pairs.toDF("u", "v").filter($"u" === $"v")
      .select($"u".as("node"), $"u".as("root"))
    edges.select($"u".as("node"), $"v".as("root"))
      .union(edges.select($"v".as("node"), $"v".as("root")))
      .union(selfRoots)
      .groupBy($"node").agg(min($"root").as("root"))
  }
}
