package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Record-level entity resolution (record linkage): multi-pass blocking →
  * Fellegi–Sunter field-agreement scoring → threshold match → transitive
  * canonicalization — the curation operator that collapses a dirty customer
  * registry (re-registrations, typo'd imports, partial records) to one
  * canonical entity per real-world customer. The reference's keyed scope
  * (`FlinkCEPExample.scala:55` keyBy user) assumes the key IS the entity;
  * this suite is what produces that key when sources disagree.
  *
  * Spark-first shape, the candidates→verify discipline of the dedup suite on
  * RECORDS instead of documents:
  *
  *   - Blocking: each record emits a small constant number of blocking keys
  *     (two passes here — (nation, name-suffix) and (segment, name-suffix) —
  *     so a record whose nation OR segment field is dirty is still reachable
  *     through the other pass). ONE shuffle on the block key; candidate
  *     pairs come from the per-block self equi-join, never all-pairs.
  *   - Hot-block guard: blocks larger than [[MaxBlock]] are dropped via the
  *     broadcast-anti-join shape of [[Dedup]]'s `MaxBucket` family — a
  *     degenerate key (e.g. an 'UNKNOWN'-segment block in a corpus where
  *     half the records lost the field) otherwise puts Σ|block|² on the
  *     tasks owning it. Dropped blocks are a measured recall trade and the
  *     production signal to pick a finer key.
  *   - Scoring: per-pair comparison vector → integer Fellegi–Sunter
  *     agreement weights (name edit-distance bucketed by codegen'd
  *     `levenshtein`, exact nation/segment/balance agreement with an
  *     explicit missing-field (UNKNOWN → 0) arm) summed and thresholded at
  *     [[MatchThreshold]]. All-integer, so the oracle compare is exact.
  *   - Canonicalization: matched pairs transitively closed with
  *     [[Components.connectedComponents]] (a pair table is not actionable
  *     until closed — A↔B and B↔C must merge even when A↔C scored below
  *     threshold), then one combinable aggregate per entity applies the
  *     survivorship rules (longest name wins ties by smallest rec_id; max
  *     balance) — no per-entity window, no sort.
  *
  * The dirty registry itself is DERIVED deterministically from `customer`
  * (base rows + an 'x'-substituted re-registration for custkey % 5 = 0 at
  * rec_id + 10^7 + a char-dropped partial record with segment UNKNOWN for
  * custkey % 10 = 0 at rec_id + 2·10^7), so the DuckDB oracle replays
  * registry construction, blocking, scoring and closure end-to-end from the
  * same parquet. At 100 TB: registry construction and blocking are narrow,
  * the block-key shuffle is the only corpus-wide exchange, per-block fan-out
  * is guard-bounded, and the closure is the same star-rounds machinery the
  * dedup graph suite ships.
  */
object EntityResolution {

  /** Hot-block guard: blocks over this size are dropped from pairing
    * (broadcast anti-join; see [[Dedup.MaxBucket]] rationale). Generous vs
    * the test corpus — largest observed block is ≤ 4 members (nation ×
    * name-suffix at sf0.1) — while bounding the worst per-block fan-out at
    * [[MaxBlock]]²/2 pairs. */
  val MaxBlock = 1000

  /** Match decision threshold on the summed agreement weights: calibrated so
    * one strong field (name at edit distance ≤ 1, +32) plus full secondary
    * agreement (+10 nation, +6 segment, +8 balance = 56) clears it, one
    * missing secondary field (UNKNOWN segment → 0, score 50) still clears
    * it, but a weak name (distance 2, +24) or any secondary DISagreement
    * under a distance-1 name (32+10+6−6 = 42) does not. */
  val MatchThreshold = 50

  /** The dirty registry: base customer rows + two deterministic corruption
    * classes (the re-registration and the partial import). Column set is the
    * linkage schema: (rec_id, name, nation, bal, seg). */
  private[graft] def registryOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val base = cust.select($"c_custkey".as("rec_id"), $"c_name".as("name"),
      $"c_nationkey".as("nation"), $"c_acctbal".as("bal"),
      $"c_mktsegment".as("seg"))
    // 'x' substituted for the first name digit: edit distance 1 from base.
    val varA = cust.filter($"c_custkey" % 5 === 0).select(
      ($"c_custkey" + 10000000L).as("rec_id"),
      concat(substring($"c_name", 1, 9), lit("x"),
        substring($"c_name", 11, 8)).as("name"),
      $"c_nationkey".as("nation"), $"c_acctbal".as("bal"),
      $"c_mktsegment".as("seg"))
    // third name digit dropped + segment lost: distance 1 from base, and
    // (because the zero-padded digit run absorbs both edits) distance ≤ 2
    // from varA — the within-cluster pair the threshold may reject, which
    // is exactly why canonicalization transitively closes.
    val varB = cust.filter($"c_custkey" % 10 === 0).select(
      ($"c_custkey" + 20000000L).as("rec_id"),
      concat(substring($"c_name", 1, 11),
        substring($"c_name", 13, 6)).as("name"),
      $"c_nationkey".as("nation"), $"c_acctbal".as("bal"),
      lit("UNKNOWN").as("seg"))
    base.unionAll(varA).unionAll(varB)
  }

  /** Blocked + scored + thresholded match pairs, unordered — the shared
    * core of [[matches]] and [[canonicalOf]]. */
  private[graft] def matchPairsOf(reg: DataFrame, maxBlock: Int): DataFrame = {
    val s = reg.sparkSession
    import s.implicits._
    // last-4 name suffix: stable under both corruption classes (the edits
    // land in the zero-run prefix of the digit field, a property of WHERE
    // real-world typos cluster the key designer must pick for).
    val last4 = expr("substring(name, length(name) - 3, 4)")
    val keys = reg.select($"rec_id", explode(array(
      concat_ws("|", lit("n"), $"nation".cast("string"), last4),
      concat_ws("|", lit("s"), $"seg", last4))).as("bk"))
    val big = keys.groupBy($"bk").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > maxBlock).select($"bk")
    val kb = keys.join(broadcast(big), Seq("bk"), "left_anti")
    val cand = kb.as("a").join(kb.as("b"),
        col("a.bk") === col("b.bk") && col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("rec_a"), col("b.rec_id").as("rec_b"))
      .distinct() // a pair may share both blocking keys
    val x = reg.select($"rec_id".as("rec_a"), $"name".as("name_a"),
      $"nation".as("nation_a"), $"bal".as("bal_a"), $"seg".as("seg_a"))
    val y = reg.select($"rec_id".as("rec_b"), $"name".as("name_b"),
      $"nation".as("nation_b"), $"bal".as("bal_b"), $"seg".as("seg_b"))
    cand.join(x, "rec_a").join(y, "rec_b")
      .withColumn("nd", levenshtein($"name_a", $"name_b"))
      .withColumn("score", (
        when($"nd" === 0, 40).when($"nd" === 1, 32)
          .when($"nd" === 2, 24).otherwise(-15)
        + when($"nation_a" === $"nation_b", 10).otherwise(-5)
        + when($"seg_a" === "UNKNOWN" || $"seg_b" === "UNKNOWN", 0)
            .when($"seg_a" === $"seg_b", 6).otherwise(-8)
        + when($"bal_a" === $"bal_b", 8).otherwise(-6)).cast("int"))
      .filter($"score" >= MatchThreshold)
      .select($"rec_a", $"rec_b", $"score")
  }

  /** Declared query: the scored match-pair table. */
  def matches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    matchPairsOf(registryOf(Tables.table(s, dir, "customer")), MaxBlock)
      .orderBy($"rec_a", $"rec_b")
  }

  /** Declared query: canonical entity table — transitive closure of
    * [[matches]] + survivorship aggregate. */
  def canonical(s: SparkSession, dir: String): DataFrame =
    canonicalOf(registryOf(Tables.table(s, dir, "customer")), MaxBlock)

  private[graft] def canonicalOf(reg: DataFrame, maxBlock: Int): DataFrame = {
    val s = reg.sparkSession
    import s.implicits._
    val pairs = matchPairsOf(reg, maxBlock).select($"rec_a", $"rec_b")
    val comp = Components.connectedComponents(pairs)
    comp.join(reg, comp("node") === reg("rec_id"))
      .groupBy($"root")
      .agg(count(lit(1)).as("n_members"),
        // survivorship via ONE combinable argmin struct, not a per-entity
        // window: longest name, ties to the smallest rec_id
        min(struct((-length($"name")).as("nl"), $"rec_id".as("ri"),
          $"name".as("nm"))).as("pick"),
        // integer cents, never DECIMAL/double out (oracle determinism
        // contract — relational.Queries.cents rationale)
        max(floor($"bal" * lit(100.0) + lit(0.5)).cast("long")).as("mbc"))
      .select($"root".as("entity_id"), $"n_members",
        $"pick.nm".as("canon_name"), $"mbc".as("max_bal_cents"))
      .orderBy($"entity_id")
  }

  /** INCREMENTAL ASSIGNMENT against a MASTER registry — the master-data
    * operation the batch linkage ([[matches]]/[[canonical]]) implies but
    * doesn't expose: given an already-resolved master (one record per
    * entity) and a batch of NEW records, resolve each newcomer to its
    * master entity (best block-candidate scoring ≥ [[MatchThreshold]],
    * ties to the smallest master id) or declare it NEW. This is how a
    * resolved registry is MAINTAINED: the full quadratic-ish linkage runs
    * once, arrivals then assign incrementally — the entity twin of the
    * frozen-IVF `ivfAssignerOf` refresh contract, and the producer of the
    * reference's keyed scope (`FlinkCEPExample.scala:55`) for streams
    * whose raw key is dirty. Live ingest runs the same plan per
    * micro-batch via foreachBatch (stream-static joins against the
    * master snapshot; the scoring is row-local).
    *
    * Shape at scale: blocking keys on both sides, hot blocks dropped on
    * the MASTER side by the same broadcast-anti-join guard, ONE block-key
    * equi-join (never incoming × master), integer scoring, and a
    * combinable per-record `max(struct(score, −master_id))` argmax — no
    * per-record window. Unmatched records keep their own id as the new
    * entity. */
  def assign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.table(s, dir, "customer")
    val full = registryOf(cust)
    // master = the clean base records; incoming = the corrupted arrivals
    assignOf(full.filter($"rec_id" >= 10000000L),
      full.filter($"rec_id" < 10000000L), MaxBlock)
  }

  /** (the streaming twin [[graft.streaming.EntityAssignStream]] replays
    * this per micro-batch against the static master snapshot) */
  private[graft] def assignOf(incoming: DataFrame, master: DataFrame,
      maxBlock: Int): DataFrame = {
    val s = incoming.sparkSession
    import s.implicits._
    def keysOf(reg: DataFrame): DataFrame = {
      val last4 = expr("substring(name, length(name) - 3, 4)")
      reg.select($"rec_id", explode(array(
        concat_ws("|", lit("n"), $"nation".cast("string"), last4),
        concat_ws("|", lit("s"), $"seg", last4))).as("bk"))
    }
    val mKeys = keysOf(master)
    val big = mKeys.groupBy($"bk").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > maxBlock).select($"bk")
    val mkG = mKeys.join(broadcast(big), Seq("bk"), "left_anti")
    val cand = keysOf(incoming).join(mkG.select($"bk", $"rec_id".as("m_id")), "bk")
      .select($"rec_id", $"m_id").distinct()
    val x = incoming.select($"rec_id", $"name".as("name_a"),
      $"nation".as("nation_a"), $"bal".as("bal_a"), $"seg".as("seg_a"))
    val y = master.select($"rec_id".as("m_id"), $"name".as("name_b"),
      $"nation".as("nation_b"), $"bal".as("bal_b"), $"seg".as("seg_b"))
    val scored = cand.join(x, "rec_id").join(y, "m_id")
      .withColumn("nd", levenshtein($"name_a", $"name_b"))
      .withColumn("score", (
        when($"nd" === 0, 40).when($"nd" === 1, 32)
          .when($"nd" === 2, 24).otherwise(-15)
        + when($"nation_a" === $"nation_b", 10).otherwise(-5)
        + when($"seg_a" === "UNKNOWN" || $"seg_b" === "UNKNOWN", 0)
            .when($"seg_a" === $"seg_b", 6).otherwise(-8)
        + when($"bal_a" === $"bal_b", 8).otherwise(-6)).cast("int"))
      .filter($"score" >= MatchThreshold)
    val best = scored.groupBy($"rec_id")
      .agg(max(struct($"score", (-$"m_id").as("nm"))).as("pick"))
      .select($"rec_id", (-$"pick.nm").as("best_m"),
        $"pick.score".as("best_score"))
    incoming.select($"rec_id").join(best, Seq("rec_id"), "left")
      .select($"rec_id",
        coalesce($"best_m", $"rec_id").as("entity_id"),
        coalesce($"best_score", lit(0)).as("score"),
        when($"best_m".isNotNull, "MATCHED").otherwise("NEW").as("status"))
      .orderBy($"rec_id")
  }

  /** Survivorship summary of a master registry, one single-member entity
    * per record — the FROZEN MASTER shape [[masterMergeOf]] folds into.
    * Internal columns: the survivorship PICK struct `(−name_len, rec_id,
    * name)` rides along so a later merge can re-apply the rule as a pure
    * struct-min without re-reading the records. */
  private[graft] def masterSummaryOf(master: DataFrame): DataFrame = {
    val s = master.sparkSession
    import s.implicits._
    master.select($"rec_id".as("entity_id"), lit(1L).as("n_members"),
      struct((-length($"name")).as("nl"), $"rec_id".as("ri"),
        $"name".as("nm")).as("pick"),
      floor($"bal" * lit(100.0) + lit(0.5)).cast("long").as("mbc"))
  }

  /** MASTER MERGE — fold an arrival batch's [[assignOf]] verdicts back
    * into the frozen master (r11 verdict #6: `EntityAssignStream`
    * documented "a master refresh is a query restart"; this is the
    * refresh). MATCHED arrivals update their entity's survivorship;
    * NEW arrivals mint single-member entities. Survivorship is a
    * COMBINABLE algebra (count-sum, struct-min for the canonical record,
    * max for balance), so touched entities re-resolve from
    * (master summary ⊕ arrival partial aggregate) — the records behind an
    * untouched entity are never re-read, and the whole merge is one
    * broadcast hash join of the batch-sized arrival aggregate against the
    * master-summary scan plus a union of the minted entities: no master
    * shuffle, cost ∝ master scan + |arrivals|. `EntityResolutionSpec`
    * pins merge ≡ one-pass re-resolution over the union.
    *
    * Contract: arrival `rec_id`s are disjoint from master ids (the
    * [[assignOf]] id-space convention) — a group can therefore never mix
    * MATCHED and NEW members. */
  private[graft] def masterMergeOf(incoming: DataFrame, master: DataFrame,
      maxBlock: Int): DataFrame = {
    val s = incoming.sparkSession
    import s.implicits._
    val asg = assignOf(incoming, master, maxBlock)
      .select($"rec_id", $"entity_id", $"status")
    val merged = mergeIntoSummary(incoming, masterSummaryOf(master), asg)
    merged.select($"entity_id", $"n_members", $"pick.nm".as("canon_name"),
      $"pick.ri".as("canon_rec"), $"mbc".as("max_bal_cents"))
  }

  /** The COMPOSABLE half of [[masterMergeOf]]: fold one arrival batch's
    * assignment verdicts into an INTERNAL master summary (`(entity_id,
    * n_members, pick, mbc)` — the shape [[masterSummaryOf]] produces and
    * this returns), so repeated merges CHAIN: the output is a valid
    * `summary` input for the next batch, and `EntityResolutionSpec` pins
    * two sequential merges ≡ one survivorship pass over the 3-way union
    * (r12 verdict #4 — production merges repeatedly between compactions;
    * one-shot equivalence alone would let a non-associative fold slip
    * through). The survivorship algebra is combinable (count-sum,
    * struct-min pick, max balance), which is exactly what makes the
    * chain order-insensitive. A batch2 match to a batch1-MINTED entity is
    * a `touched` update here like any other — minted entities are real
    * summary rows the moment they fold in. */
  private[graft] def mergeIntoSummary(incoming: DataFrame,
      summary: DataFrame, asg: DataFrame): DataFrame = {
    val s = incoming.sparkSession
    import s.implicits._
    // two consumers (touched-entity join + minted union): batch-sized
    val arrAgg = graft.Caches.cached(
      incoming.join(asg.select($"rec_id", $"entity_id", $"status"), "rec_id")
        .groupBy($"entity_id")
        .agg(count(lit(1)).as("a_n"),
          min(struct((-length($"name")).as("nl"), $"rec_id".as("ri"),
            $"name".as("nm"))).as("a_pick"),
          max(floor($"bal" * lit(100.0) + lit(0.5)).cast("long")).as("a_mbc"),
          max(($"status" === "NEW").cast("int")).as("is_new")))
    val arr0 = arrAgg.filter($"is_new" === 0)
    val touched = summary
      .join(broadcast(arr0
          .select($"entity_id", $"a_n", $"a_pick", $"a_mbc")),
        Seq("entity_id"), "left")
      .select($"entity_id",
        ($"n_members" + coalesce($"a_n", lit(0L))).as("n_members"),
        // array_min skips NULL elements: untouched entities keep their pick
        array_min(array($"pick", $"a_pick")).as("pick"),
        greatest($"mbc", $"a_mbc").as("mbc"))
    val minted = arrAgg.filter($"is_new" === 1)
      .select($"entity_id", $"a_n".as("n_members"), $"a_pick".as("pick"),
        $"a_mbc".as("mbc"))
    // CONTRACT, ENFORCED (r13 ADVICE): every non-NEW entity_id in the
    // arrival aggregate must exist in `summary` — `touched`'s join is from
    // the summary side, so a caller that assigned batch N against a STALE
    // master without remapping the verdicts through the prior merges'
    // entity map would otherwise lose those arrivals silently. In-plan,
    // not a driver action: matched ids reduce to a ≤|batch| list (ONE
    // broadcast semi-join pass over the summary's entity_id column — the
    // same columnar scan class as the touch join), and an orphan raises at
    // runtime through this zero-rows-when-healthy union branch.
    val matchedIds = summary.select($"entity_id")
      .join(broadcast(arr0.select($"entity_id")), Seq("entity_id"), "left_semi")
    // the raise lives in a FILTER over a 1-row AGGREGATE of the orphan
    // set: a raise in a projected column gets COLUMN-PRUNED whenever the
    // consumer doesn't read it, and a raise in a plain filter predicate
    // referencing only left-side columns gets PUSHED below the anti-join
    // (raising for every arrival — measured, not theoretical). A filter on
    // an aggregate output can do neither: healthy input aggregates to
    // n_orphans = 0 and the gate drops the row; any orphan raises with a
    // sample id in the message.
    val orphans = arr0.select($"entity_id")
      .join(broadcast(matchedIds), Seq("entity_id"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"), min($"entity_id").as("orphan_id"))
      .filter(when($"n_orphans" === 0L, lit(false))
        .otherwise(raise_error(concat(lit("mergeIntoSummary: arrival " +
          "aggregate references an entity_id absent from summary (remap " +
          "the batch's assign verdicts through the prior merge's entity " +
          "map): "), $"orphan_id".cast("string"))).cast("boolean")))
      .select(lit(-1L).as("entity_id"),
        lit(null).cast("long").as("n_members"),
        lit(null).cast(summary.schema("pick").dataType).as("pick"),
        lit(null).cast("long").as("mbc"))
    touched.unionByName(minted).unionByName(orphans)
  }

  /** Declared query: the merged master after folding the corrupted-arrival
    * batch into the clean-base master — the refresh that closes
    * [[assign]]'s loop. */
  def masterMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val full = registryOf(Tables.table(s, dir, "customer"))
    masterMergeOf(full.filter($"rec_id" >= 10000000L),
        full.filter($"rec_id" < 10000000L), MaxBlock)
      .orderBy($"entity_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_matches" -> matches _,
    "q_entity_canonical" -> canonical _,
    "q_entity_assign" -> assign _,
    "q_entity_master_merge" -> masterMerge _,
  )

  /** Shared oracle CTEs: registry → blocking → guard → scoring → matches,
    * replayed from the same parquet with the same integer weights. */
  private val matchCtes =
    s"""reg AS (
       |  SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nation,
       |         c_acctbal AS bal, c_mktsegment AS seg FROM customer
       |  UNION ALL
       |  SELECT c_custkey + 10000000,
       |         concat(substr(c_name, 1, 9), 'x', substr(c_name, 11, 8)),
       |         c_nationkey, c_acctbal, c_mktsegment
       |  FROM customer WHERE c_custkey % 5 = 0
       |  UNION ALL
       |  SELECT c_custkey + 20000000,
       |         concat(substr(c_name, 1, 11), substr(c_name, 13, 6)),
       |         c_nationkey, c_acctbal, 'UNKNOWN'
       |  FROM customer WHERE c_custkey % 10 = 0),
       |keys AS (
       |  SELECT rec_id, concat('n|', CAST(nation AS VARCHAR), '|',
       |    substring(name, length(name) - 3, 4)) AS bk FROM reg
       |  UNION ALL
       |  SELECT rec_id, concat('s|', seg, '|',
       |    substring(name, length(name) - 3, 4)) FROM reg),
       |big AS (SELECT bk FROM keys GROUP BY bk HAVING count(*) > $MaxBlock),
       |kb AS (SELECT k.rec_id, k.bk FROM keys k
       |       LEFT JOIN big b ON b.bk = k.bk WHERE b.bk IS NULL),
       |cand AS (SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b
       |         FROM kb a JOIN kb b ON a.bk = b.bk AND a.rec_id < b.rec_id),
       |scored AS (
       |  SELECT c.rec_a, c.rec_b,
       |    CAST(CASE levenshtein(x.name, y.name)
       |           WHEN 0 THEN 40 WHEN 1 THEN 32 WHEN 2 THEN 24
       |           ELSE -15 END
       |       + CASE WHEN x.nation = y.nation THEN 10 ELSE -5 END
       |       + CASE WHEN x.seg = 'UNKNOWN' OR y.seg = 'UNKNOWN' THEN 0
       |              WHEN x.seg = y.seg THEN 6 ELSE -8 END
       |       + CASE WHEN x.bal = y.bal THEN 8 ELSE -6 END AS INT) AS score
       |  FROM cand c JOIN reg x ON x.rec_id = c.rec_a
       |              JOIN reg y ON y.rec_id = c.rec_b),
       |mtch AS (SELECT rec_a, rec_b, score FROM scored
       |         WHERE score >= $MatchThreshold)""".stripMargin

  val oracles: Map[String, String] = Map(
    // bipartite blocking → guarded master keys → scoring → per-record
    // argmax (score desc, master id asc) with the NEW fallback
    "q_entity_assign" ->
      s"""WITH $matchCtes,
         |inc AS (SELECT * FROM reg WHERE rec_id >= 10000000),
         |mst AS (SELECT * FROM reg WHERE rec_id < 10000000),
         |mk AS (
         |  SELECT rec_id, concat('n|', CAST(nation AS VARCHAR), '|',
         |    substring(name, length(name) - 3, 4)) AS bk FROM mst
         |  UNION ALL
         |  SELECT rec_id, concat('s|', seg, '|',
         |    substring(name, length(name) - 3, 4)) FROM mst),
         |mbig AS (SELECT bk FROM mk GROUP BY bk HAVING count(*) > $MaxBlock),
         |mkg AS (SELECT k.rec_id, k.bk FROM mk k
         |        LEFT JOIN mbig b ON b.bk = k.bk WHERE b.bk IS NULL),
         |ik AS (
         |  SELECT rec_id, concat('n|', CAST(nation AS VARCHAR), '|',
         |    substring(name, length(name) - 3, 4)) AS bk FROM inc
         |  UNION ALL
         |  SELECT rec_id, concat('s|', seg, '|',
         |    substring(name, length(name) - 3, 4)) FROM inc),
         |acand AS (SELECT DISTINCT i.rec_id, m.rec_id AS m_id
         |          FROM ik i JOIN mkg m ON m.bk = i.bk),
         |ascored AS (
         |  SELECT c.rec_id, c.m_id,
         |    CAST(CASE levenshtein(x.name, y.name)
         |           WHEN 0 THEN 40 WHEN 1 THEN 32 WHEN 2 THEN 24
         |           ELSE -15 END
         |       + CASE WHEN x.nation = y.nation THEN 10 ELSE -5 END
         |       + CASE WHEN x.seg = 'UNKNOWN' OR y.seg = 'UNKNOWN' THEN 0
         |              WHEN x.seg = y.seg THEN 6 ELSE -8 END
         |       + CASE WHEN x.bal = y.bal THEN 8 ELSE -6 END AS INT) AS score
         |  FROM acand c JOIN inc x ON x.rec_id = c.rec_id
         |               JOIN mst y ON y.rec_id = c.m_id),
         |abest AS (SELECT rec_id, m_id, score FROM (
         |  SELECT rec_id, m_id, score, row_number() OVER (
         |    PARTITION BY rec_id ORDER BY score DESC, m_id) AS rk
         |  FROM ascored WHERE score >= $MatchThreshold) WHERE rk = 1)
         |SELECT i.rec_id,
         |  CAST(COALESCE(b.m_id, i.rec_id) AS BIGINT) AS entity_id,
         |  CAST(COALESCE(b.score, 0) AS INT) AS score,
         |  CASE WHEN b.m_id IS NOT NULL THEN 'MATCHED' ELSE 'NEW' END
         |    AS status
         |FROM inc i LEFT JOIN abest b ON b.rec_id = i.rec_id
         |ORDER BY i.rec_id""".stripMargin,
    "q_entity_matches" ->
      s"""WITH $matchCtes
         |SELECT rec_a, rec_b, score FROM mtch ORDER BY rec_a, rec_b""".stripMargin,
    // the merged master replayed as a FULL ONE-PASS RE-RESOLUTION over the
    // union (assign chain → every record tagged with its entity → one
    // survivorship window per entity): hash equality with the Spark side's
    // touched-only combinable merge IS the merge ≡ re-resolution contract
    "q_entity_master_merge" ->
      s"""WITH $matchCtes,
         |inc AS (SELECT * FROM reg WHERE rec_id >= 10000000),
         |mst AS (SELECT * FROM reg WHERE rec_id < 10000000),
         |mk AS (
         |  SELECT rec_id, concat('n|', CAST(nation AS VARCHAR), '|',
         |    substring(name, length(name) - 3, 4)) AS bk FROM mst
         |  UNION ALL
         |  SELECT rec_id, concat('s|', seg, '|',
         |    substring(name, length(name) - 3, 4)) FROM mst),
         |mbig AS (SELECT bk FROM mk GROUP BY bk HAVING count(*) > $MaxBlock),
         |mkg AS (SELECT k.rec_id, k.bk FROM mk k
         |        LEFT JOIN mbig b ON b.bk = k.bk WHERE b.bk IS NULL),
         |ik AS (
         |  SELECT rec_id, concat('n|', CAST(nation AS VARCHAR), '|',
         |    substring(name, length(name) - 3, 4)) AS bk FROM inc
         |  UNION ALL
         |  SELECT rec_id, concat('s|', seg, '|',
         |    substring(name, length(name) - 3, 4)) FROM inc),
         |acand AS (SELECT DISTINCT i.rec_id, m.rec_id AS m_id
         |          FROM ik i JOIN mkg m ON m.bk = i.bk),
         |ascored AS (
         |  SELECT c.rec_id, c.m_id,
         |    CAST(CASE levenshtein(x.name, y.name)
         |           WHEN 0 THEN 40 WHEN 1 THEN 32 WHEN 2 THEN 24
         |           ELSE -15 END
         |       + CASE WHEN x.nation = y.nation THEN 10 ELSE -5 END
         |       + CASE WHEN x.seg = 'UNKNOWN' OR y.seg = 'UNKNOWN' THEN 0
         |              WHEN x.seg = y.seg THEN 6 ELSE -8 END
         |       + CASE WHEN x.bal = y.bal THEN 8 ELSE -6 END AS INT) AS score
         |  FROM acand c JOIN inc x ON x.rec_id = c.rec_id
         |               JOIN mst y ON y.rec_id = c.m_id),
         |abest AS (SELECT rec_id, m_id FROM (
         |  SELECT rec_id, m_id, row_number() OVER (
         |    PARTITION BY rec_id ORDER BY score DESC, m_id) AS rk
         |  FROM ascored WHERE score >= $MatchThreshold) WHERE rk = 1),
         |uni AS (
         |  SELECT rec_id AS entity_id, rec_id, name, bal FROM mst
         |  UNION ALL
         |  SELECT COALESCE(b.m_id, i.rec_id), i.rec_id, i.name, i.bal
         |  FROM inc i LEFT JOIN abest b ON b.rec_id = i.rec_id)
         |SELECT entity_id, n_members, canon_name, canon_rec, max_bal_cents
         |FROM (
         |  SELECT entity_id,
         |    CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
         |      AS n_members,
         |    name AS canon_name, CAST(rec_id AS BIGINT) AS canon_rec,
         |    max(CAST(floor(bal * 100.0 + 0.5) AS BIGINT))
         |      OVER (PARTITION BY entity_id) AS max_bal_cents,
         |    row_number() OVER (PARTITION BY entity_id
         |      ORDER BY length(name) DESC, rec_id) AS rk
         |  FROM uni)
         |WHERE rk = 1 ORDER BY entity_id""".stripMargin,
    // Transitive closure by recursive reachability (exact at oracle scale;
    // the Spark side's star rounds are the 100 TB shape) + the same
    // survivorship resolved with a per-entity window.
    "q_entity_canonical" ->
      s"""WITH RECURSIVE $matchCtes,
         |edges AS (SELECT rec_a AS u, rec_b AS v FROM mtch
         |          UNION SELECT rec_b, rec_a FROM mtch),
         |walk(node, reach) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach),
         |comp AS (SELECT node, min(reach) AS root FROM walk GROUP BY node),
         |cr AS (SELECT c.root, c.node, r.name, r.bal
         |       FROM comp c JOIN reg r ON r.rec_id = c.node)
         |SELECT entity_id, n_members, canon_name, max_bal_cents FROM (
         |  SELECT root AS entity_id, node,
         |    CAST(count(*) OVER (PARTITION BY root) AS BIGINT) AS n_members,
         |    name AS canon_name,
         |    max(CAST(floor(bal * 100.0 + 0.5) AS BIGINT))
         |      OVER (PARTITION BY root) AS max_bal_cents,
         |    row_number() OVER (PARTITION BY root
         |      ORDER BY length(name) DESC, node) AS rk
         |  FROM cr)
         |WHERE rk = 1 ORDER BY entity_id""".stripMargin,
  )
}
