package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Automated anti-pattern scan over EVERY declared query's physical plan —
  * the at-scale discipline as a pinned invariant instead of a manual
  * per-round audit:
  *
  *  - no `CartesianProduct` outside the intentional allowlist (a cartesian
  *    that appears when a join condition stops being equi-joinable is the
  *    classic silent 100 TB killer);
  *  - no `Exchange SinglePartition` outside the allowlist (a global
  *    single-partition shuffle of corpus-sized data cannot scale; the
  *    allowlisted ones are provably bounded tables — see each entry).
  *
  * Runs at plan time only (no execution), so the full declared-query sweep
  * is cheap enough for every `sbt test`.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to contain a CartesianProduct node: NONE — even the
    * intentional q_join_cross plans as a BroadcastNestedLoopJoin (bounded
    * broadcast side), so any CartesianProduct is a regression. */
  private val cartesianOk = Set.empty[String]

  /** Queries allowed a SinglePartition exchange — each feeds a table that
    * is BOUNDED by construction (1-row global aggregates / a sub-4096-row
    * recursion tier), never corpus-sized. */
  private val singlePartitionOk = Set(
    // hierarchical prefix sum base case: ≤ input/4096² rows by construction
    "q_text_pack", "q_text_pack_bpe", "q_text_pack_unigram",
    "q_pipeline_full", // its packing stage — the same bounded base tier
    // hierarchical suffix-min base case: ≤ buckets/4096² rows (same machinery)
    "q_skyline",
    // 1-row global corpus-stats aggregates (count/avgdl, token totals,
    // weight totals): the final step of a partial+final global agg
    "q_text_bm25", "q_text_tfidf", "q_text_perplexity", "q_sample_weighted",
    "q_retrieval_rrf", // the bm25 arm's 1-row (n, avgdl) corpus-stats agg
    "q_mixture_temperature", // 1-row Σw_micro normalizer over the rate table
    "q_sample_dsir",    // 1-row (tt, rt) token-total aggregate over 64 buckets
    "q_profile_drift",  // 1-row corpus token total over the 64-bucket table
    "q_text_collocations", // 1-row unigram/bigram totals for the lift denominator
    "q_dedup_recall",   // three 1-row count aggregates crossJoined to one row
    "q_dedup_recall_sampled", // the same audit on the document sample
    "q_funnel_steps",   // three 1-row stage counts crossJoined to one row
    // 1-row sketch aggregates probed via scalar subquery
    "q_dedup_incremental", // BloomFilterAggregate over the batch spans
    "q_text_heavyhitters", // count_min_sketch over the token stream
    // (q_ann_recall_pq lost its InjectRuntimeFilter entry in r15: the PQ
    // model serves codes from the parquet artifact, no filterable join)
    // InjectRuntimeFilter (r10): the cluster-map side of the
    // keep-filter join became a checkpointed-RDD scan (Components now
    // checkpoints its input pair lineage), so Spark builds a 1-row bloom
    // from the gated-docs side — a bounded runtime-filter aggregate
    "q_pipeline_curate_near",
    "q_text_tfidf_pairs", // 1-row doc-count aggregate for the idf
    "q_index_refresh", // 1-row snapshot-baseline mean-error aggregate
    // the ONE-PASS metric/constraint aggregate: the whole suite reduces to
    // a single row (partial+final global agg), then explodes into the
    // constraint-count-sized output — bounded by construction
    "q_dq_metrics", "q_dq_verdict",
    // two 1-row aggregates (per-order rollup + scan-only lineitem count)
    "q_dq_cross",
    // the 1-row global moment aggregate over the per-order rollup
    "q_stats_corr", "q_stats_regress",
    // the 1-row 2×2 contingency aggregate over the per-user rollup
    "q_stats_ab_chi2",
    // 1-row distinct-user total for the support_bp denominator
    "q_seq_support",
    // the orphan GATE (r14): the remap-contract guard aggregates the
    // anti-joined orphan set — batch-sized by construction — to one
    // (n_orphans, sample) row whose filter raises when non-empty
    "q_entity_master_merge",
    // 1-row (total, key-count) aggregate over the key-bounded count table
    "q_join_skew_diagnose",
    // 1-row query-set-count aggregate for the recall denominator (r11)
    "q_ann_recall_trunc",
    // 1-row edge-count aggregate (m) + the 1-row final modularity fold
    // over the community-bounded per-label table (r11)
    "q_dedup_modularity",
    // (q_dedup_refine lost its 1-row m entry in r15: the refinement round
    // runs the driver tail solve under the gate — no distributed fold)
    // the 1-row m aggregate plus the two 1-row modularity folds the
    // Q gate compares (r13)
    "q_dedup_canonical_refined",
    // 1-row class-prior aggregate over the ≤ClfBuckets-row count table (r11)
    "q_text_classifier_fit",
    // the same 1-row prior, re-derived from the MERGED count table (r15)
    "q_classifier_merge"
    // (q_text_bpe_pairs' global ranking window needs no exchange: Catalyst's
    // LimitPushdownThroughWindow turns rnk<=K into TakeOrderedAndProject;
    // q_sample_priority's global top-(k+1) collapses the same way)
  )

  /** Queries allowed a BroadcastNestedLoopJoin — legitimate ONLY when the
    * broadcast side is bounded by construction (a BNLJ against a
    * corpus-sized build side OOMs the cluster; these are all K-row / 1-row
    * / query-set-sized). */
  private val bnljOk = Set(
    "q_join_cross", // bounded nation×region cross join (the intentional one)
    // 1-row corpus-stats / normalizer tables crossJoined into the plan
    "q_text_bm25", "q_text_perplexity", "q_sample_weighted",
    "q_mixture_temperature", "q_text_tfidf", // 1-row doc-count for the idf
    "q_retrieval_rrf", // bm25 stats + the 1-row dense-arm query vector
    "q_sample_dsir",    // 1-row totals into the 64-row ratio table
    "q_profile_drift",  // 64-row bucket table × 1-row total into the grid
    "q_text_collocations", // 1-row T × 1-row B crossJoined into the score
    "q_dedup_recall",   // 1-row count × 1-row count × 1-row count
    "q_dedup_recall_sampled", // the same audit on the document sample
    "q_funnel_steps",   // 1-row stage counts crossJoined
    // K-row centroid tables (IVF probe ranking) and query-set-sized
    // exact-baseline sides of the recall audits. (q_similarity_ivf,
    // q_similarity_knn_join, and q_dedup_semantic lost their entries in
    // r8: the k-means-training BNLJ now runs ONCE per process when the
    // shared IVF index materializes, so the declared plans are parquet
    // scans + equi-joins.)
    "q_similarity_ivf_probe",
    // the same K-row centroid crossJoin, probing the MERGED cell table
    // (r12; training collapses to a plan-time collect as in ivf_assign)
    "q_similarity_index_merge",
    "q_ann_recall", "q_ann_recall_ivf", "q_ann_recall_pq",
    // corpus-broadcast exact baseline (audit-scale only, input-size-required
    // in annRecallKnn)
    "q_ann_recall_knn",
    // the frontier sweep: the 6-row nprobe table joined on rn <= nprobe,
    // plus the same audit-scale exact baseline as q_ann_recall_knn
    "q_ann_recall_frontier",
    // 1-row broadcast tables: the τ threshold / the idf doc count
    "q_sample_priority", "q_text_tfidf_pairs",
    // 1-row distinct-user total crossed onto the alphabet²-bounded matrix
    "q_seq_support",
    // 1-row (total, key-count) crossed onto the key-cardinality table
    "q_join_skew_diagnose",
    // 4-row dims table × 1-row query-count aggregate (r11 truncation
    // frontier assembly; the query-set side of the audit itself is a
    // broadcast HASH join on dims, not a BNLJ)
    "q_ann_recall_trunc",
    // 1-row m (edge count) crossJoined onto the community-bounded
    // per-label table (r11 modularity)
    "q_dedup_modularity",
    // (q_dedup_refine lost its entry in r15 — driver tail solve, no
    // distributed m crossJoin under the gate)
    // the refinement's 1-row m crossJoins + the 1-row × 1-row Q gate
    // broadcast onto the per-node table (r13)
    "q_dedup_canonical_refined",
    // 1-row class prior crossJoined onto the ≤ClfBuckets-row count table
    "q_text_classifier_fit",
    // the same prior crossJoin over the merged count table (r15)
    "q_classifier_merge",
    // 1-row scan-only lineitem count crossed onto the 1-row audit row
    "q_dq_cross",
    // the MinhashK-row threshold table non-equi-joined (matches >= t) onto
    // the K-bounded agreement histograms
    "q_dedup_threshold_frontier",
    // source-catalog-bounded centroid pair join (explicit broadcast — the
    // planner would otherwise cartesian the non-equi condition)
    "q_embedding_drift",
    // K-row centroid broadcast in the snapshot assignment's lineage (the
    // ivf_probe shape) + the 1-row baseline crossJoined onto the per-
    // source aggregate
    "q_index_refresh"
  )

  private def plansOf(name: String): String = {
    val fn = graft.SparkEntry.queries(name)
    // executedPlan (post-EnsureRequirements): exchanges are inserted here —
    // sparkPlan would miss every SinglePartition shuffle. Still plan-only,
    // no job runs.
    fn(spark, sf).queryExecution.executedPlan.toString
  }

  // Exact-set pinning: a NEW offender fails (scale regression), and a plan
  // IMPROVEMENT that drops an allowlisted node also fails (update the list —
  // the allowlist never goes stale).
  private lazy val offenders: Map[String, Set[String]] = {
    val hits = graft.SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val plan = plansOf(name)
      name -> Seq(
        if (plan.contains("CartesianProduct")) Some("cartesian") else None,
        if (plan.contains("Exchange SinglePartition")) Some("singlepart") else None,
        if (plan.contains("BroadcastNestedLoopJoin")) Some("bnlj") else None
      ).flatten
    }
    Map(
      "cartesian" -> hits.collect { case (n, t) if t.contains("cartesian") => n }.toSet,
      "singlepart" -> hits.collect { case (n, t) if t.contains("singlepart") => n }.toSet,
      "bnlj" -> hits.collect { case (n, t) if t.contains("bnlj") => n }.toSet)
  }

  test("CartesianProduct appears in exactly the allowlisted query plans") {
    assert(offenders("cartesian") == cartesianOk,
      s"extra: ${(offenders("cartesian") -- cartesianOk).toSeq.sorted.mkString(", ")}; " +
        s"stale allowlist: ${(cartesianOk -- offenders("cartesian")).toSeq.sorted.mkString(", ")}")
  }

  test("SinglePartition exchange appears in exactly the allowlisted query plans") {
    assert(offenders("singlepart") == singlePartitionOk,
      s"extra: ${(offenders("singlepart") -- singlePartitionOk).toSeq.sorted.mkString(", ")}; " +
        s"stale allowlist: ${(singlePartitionOk -- offenders("singlepart")).toSeq.sorted.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin appears in exactly the allowlisted query plans") {
    assert(offenders("bnlj") == bnljOk,
      s"extra: ${(offenders("bnlj") -- bnljOk).toSeq.sorted.mkString(", ")}; " +
        s"stale allowlist: ${(bnljOk -- offenders("bnlj")).toSeq.sorted.mkString(", ")}")
  }

  test("scan pushdown: filters and pruned columns reach the parquet scan") {
    // the flagship scan query: the quantity predicate must be in
    // PushedFilters (footer/row-group pruning at 100 TB) and the scan
    // schema must be the 5 projected columns, not lineitem's 16
    val plan = plansOf("q_scan_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_quantity,45.0)]"), plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString("; "))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      readSchema)
  }
}
