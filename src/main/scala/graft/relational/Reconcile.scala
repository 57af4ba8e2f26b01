package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Cross-snapshot table reconciliation — the anti-entropy / merkle-repair
  * primitive every replicated 100 TB store runs (Cassandra repair,
  * DynamoDB backup verify, warehouse replication audits): given a source
  * table and a replica, find every key that is MISSING, EXTRA, or CHANGED
  * on the replica — without ever shuffling or joining the full tables by
  * key.
  *
  * Two-phase shape at scale:
  *   1. each side collapses to [[NumBuckets]] (count, XOR-of-row-signature)
  *      summaries — one map-side-combinable aggregate per side, the only
  *      corpus-wide pass; the bucket join is [[NumBuckets]]-row trivial;
  *   2. only rows hashing into a MISMATCHED bucket (broadcast semi-join
  *      against the tiny bucket list — no driver collect) re-scan into the
  *      full-outer key join that names the differing keys.
  * When drift is small — the operational case — phase 2 touches
  * |mismatched buckets| / [[NumBuckets]] of the data, and the exchange
  * that exists is sized by the DRIFT, not the table. An XOR checksum
  * collision (two drifted rows cancelling inside one bucket alongside a
  * preserved count) would hide a bucket; with 64-bit row signatures the
  * probability is ~2⁻⁶⁴ per bucket, and the declared query stays
  * hash-exact against an oracle that diffs the tables directly.
  *
  * The declared query audits `orders` against a simulated drifted replica
  * ([[replicaOf]]: deterministic arithmetic drops / cent-flips / phantom
  * inserts, the Jepsen-style fault injection) so the diff is non-empty and
  * oracle-checkable at every SF; `tableDiff` itself is the generic
  * operator (any keyed frame with a comparable payload).
  */
object Reconcile {

  /** Buckets for the phase-1 summary — at 100 TB raise to ~2²⁰ so each
    * bucket's phase-2 rescan slice stays executor-sized. */
  val NumBuckets = 1024

  /** Keys dropped on the replica: k ≡ [[DropRes]] (mod [[DropMod]]). */
  val DropMod = 1000L; val DropRes = 7L
  /** Keys whose cents payload drifts by +1: k ≡ 3 (mod 997). */
  val FlipMod = 997L; val FlipRes = 3L
  /** Keys cloned as phantom replica-only rows at k + [[InsShift]]. */
  val InsMod = 5000L; val InsRes = 1L; val InsShift = 100000000L

  /** The audited payload projection of `orders`: key + exact integer
    * cents + the two categorical columns a replication bug typically
    * corrupts. */
  def ordersPayload(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    orders.select($"o_orderkey".as("k"),
      floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"),
      $"o_custkey".as("custkey"), $"o_orderstatus".as("status"))
  }

  /** Deterministic drifted replica of a `(k, cents, custkey, status)`
    * payload frame: drops, cent-flips, and phantom inserts per the
    * modulus constants above — the fault injection the audit must catch. */
  def replicaOf(payload: DataFrame): DataFrame = {
    val s = payload.sparkSession
    import s.implicits._
    val kept = payload
      .filter($"k" % DropMod =!= DropRes)
      .withColumn("cents",
        when($"k" % FlipMod === FlipRes, $"cents" + 1L).otherwise($"cents"))
    val phantoms = payload
      .filter($"k" % InsMod === InsRes)
      .withColumn("k", $"k" + InsShift)
    kept.unionByName(phantoms)
  }

  /** Generic two-phase diff of two `(k, cents, custkey, status)` frames.
    * Emits one row per differing key: verdict ∈ missing (in src only),
    * extra (in replica only), changed (payload differs), with both sides'
    * cents for the drill-down. */
  def tableDiff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    def sig(df: DataFrame): DataFrame = df.select(
      $"k", $"cents",
      pmod(xxhash64($"k"), lit(NumBuckets)).as("bucket"),
      xxhash64($"k", $"cents", $"custkey", $"status").as("sig"))
    def summary(df: DataFrame): DataFrame = df
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(sig)").as("x"))
    // deliberately NOT cached: at 100 TB the right cost model is two scans
    // (summaries, then the pruned rescan), never a corpus-sized cache
    val a = sig(src)
    val b = sig(dst)
    // phase 1: NumBuckets-row summaries; a bucket mismatches if counts or
    // XOR checksums differ (or it exists on one side only)
    val bad = summary(a).withColumnsRenamed(Map("n" -> "na", "x" -> "xa"))
      .join(summary(b).withColumnsRenamed(Map("n" -> "nb", "x" -> "xb")),
        Seq("bucket"), "full_outer")
      .filter(!($"na" <=> $"nb") || !($"xa" <=> $"xb"))
      .select($"bucket")
    // phase 2: rescan ONLY the mismatched buckets' rows on each side
    val sa = a.join(broadcast(bad), Seq("bucket"), "left_semi")
      .select($"k", $"cents".as("src_cents"), $"sig".as("sig_a"))
    val sb = b.join(broadcast(bad), Seq("bucket"), "left_semi")
      .select($"k", $"cents".as("dst_cents"), $"sig".as("sig_b"))
    sa.join(sb, Seq("k"), "full_outer")
      .withColumn("verdict",
        when($"sig_b".isNull, lit("missing"))
          .when($"sig_a".isNull, lit("extra"))
          .when($"sig_a" =!= $"sig_b", lit("changed")))
      .filter($"verdict".isNotNull)
      .select($"k", $"verdict",
        coalesce($"src_cents", lit(-1L)).as("src_cents"),
        coalesce($"dst_cents", lit(-1L)).as("dst_cents"))
      .orderBy($"k")
  }

  /** Declared query: audit `orders` against the simulated drifted
    * replica. */
  def ordersAudit(s: SparkSession, dir: String): DataFrame = {
    val payload = ordersPayload(Tables.table(s, dir, "orders"))
    tableDiff(payload, replicaOf(payload))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_diff" -> ordersAudit _,
  )

  // the oracle diffs the tables DIRECTLY (full outer join on the key) —
  // the bucket/checksum machinery is internal routing and must not change
  // the answer
  val oracles: Map[String, String] = Map(
    "q_table_diff" ->
      s"""WITH p AS (SELECT o_orderkey AS k,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         |    o_custkey AS custkey, o_orderstatus AS status
         |  FROM orders),
         |r AS (SELECT k,
         |    CASE WHEN k % $FlipMod = $FlipRes THEN cents + 1 ELSE cents END AS cents,
         |    custkey, status
         |  FROM p WHERE k % $DropMod <> $DropRes
         |  UNION ALL
         |  SELECT k + $InsShift, cents, custkey, status
         |  FROM p WHERE k % $InsMod = $InsRes),
         |f AS (SELECT COALESCE(p.k, r.k) AS k,
         |    CASE WHEN r.k IS NULL THEN 'missing'
         |         WHEN p.k IS NULL THEN 'extra'
         |         WHEN p.cents <> r.cents OR p.custkey <> r.custkey
         |              OR p.status <> r.status THEN 'changed' END AS verdict,
         |    COALESCE(p.cents, -1) AS src_cents,
         |    COALESCE(r.cents, -1) AS dst_cents
         |  FROM p FULL OUTER JOIN r ON p.k = r.k)
         |SELECT k, verdict, CAST(src_cents AS BIGINT) AS src_cents,
         |  CAST(dst_cents AS BIGINT) AS dst_cents
         |FROM f WHERE verdict IS NOT NULL ORDER BY k""".stripMargin,
  )
}
