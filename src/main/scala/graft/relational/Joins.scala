package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Join inventory (SURVEY.md §2.3): every join shape the engine exposes.
  * The reference has no joins at all (its only temporal constraint is the CEP
  * `within`, `FlinkCEPExample.scala:74`) — this is the engine's declared
  * relational surface. All built-ins: Catalyst's JoinSelection + AQE pick
  * broadcast/SMJ/shuffled-hash; hints pin strategies where the query name
  * promises one.
  */
object Joins {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Inner equi-join, strategy left to Catalyst/AQE. */
  def inner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name")
      .orderBy($"o_orderkey")
  }

  /** Sort-merge join pinned via MERGE hint (the at-scale fact⋈fact strategy). */
  def sortMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").hint("merge")
      .join(t(s, dir, "orders").hint("merge"), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Left outer join + null-safe aggregation over the unmatched side —
    * money quantized to cents per-row before the sum (exact integer fold,
    * no DECIMAL output; see [[Queries.cents]]). */
  def left(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"o_custkey" === $"c_custkey", "left")
      .groupBy($"c_custkey")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(sum(Queries.cents($"o_totalprice")), lit(0L)).as("total_cents"))
      .orderBy($"c_custkey")
  }

  /** Left-semi (EXISTS). */
  def semi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey")
      .orderBy($"c_custkey")
  }

  /** Left-anti (NOT EXISTS) — against the urgent-order subset so the result
    * is non-empty at every scale factor (every customer has SOME order). */
  def anti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
    t(s, dir, "customer")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey")
      .orderBy($"c_custkey")
  }

  /** Temporal range join: per user, (error, purchase) pairs within 1 hour —
    * the relational cousin of the CEP `within` constraint. Equi on user_id
    * (shuffle) + range residual; second-truncated on both engines (ns caveat).
    */
  def range(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("ts_sec", date_trunc("second", $"ts"))
    val a = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id", $"ts_sec".as("err_ts"))
    val b = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pur_id"), $"user_id".as("u2"), $"ts_sec".as("pur_ts"))
    a.join(b, $"user_id" === $"u2" &&
        $"pur_ts" >= $"err_ts" && $"pur_ts" <= $"err_ts" + expr("INTERVAL 1 HOUR"))
      .select($"err_id", $"pur_id")
      .orderBy($"err_id", $"pur_id")
  }

  /** Declared as-of query, served by the CUSTOM sort-merge operator
    * (graft.plans.AsOf — LogicalPlan + Strategy + SparkPlan): one exchange +
    * sort per side, single forward merge pass, O(1) state. The DuckDB oracle
    * validates the custom operator at every scale factor; [[asOf]] below is
    * the compose-based baseline it is also cross-checked against.
    */
  def asOfCustom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("ts_sec"))
    val o = t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    graft.plans.AsOf.join(ev, o,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTsCol = "ts_sec", rightTsCol = "o_orderdate",
        rightTiebreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
      .orderBy($"event_id")
  }

  /** As-of join: latest order at-or-before each event's time for the event's
    * user. Composed as range join + per-event rank (preference (a) of the
    * custom-operator ladder); deterministic tiebreak on (o_orderdate, o_orderkey).
    */
  def asOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("ts_sec"))
    val o = t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    val w = Window.partitionBy($"event_id")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    ev.join(o, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts_sec")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"o_orderkey")
      .orderBy($"event_id")
  }

  /** LEFT-OUTER as-of through the custom sort-merge operator: every event
    * row survives; events with no at-or-before order carry -1 (nullable
    * int64 surfaces as float64 in pandas — the same representation hazard
    * class as DECIMAL, so the null is coalesced on both sides). */
  def asOfLeft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", date_trunc("second", $"ts").as("ts_sec"))
    val o = t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    graft.plans.AsOf.join(ev, o,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTsCol = "ts_sec", rightTsCol = "o_orderdate",
        rightTiebreak = Seq("o_orderkey"), joinType = "left")
      .select($"event_id", coalesce($"o_orderkey", lit(-1L)).as("o_orderkey"))
      .orderBy($"event_id")
  }

  /** One-time bucketed-layout setup for [[bucketed]]: writes both join sides
    * bucketed+sorted on the join key. Memoized per (session, source dir) so
    * a benchmark harness can run it untimed once and the query fn measures
    * only the no-Exchange join — at production scale the bucketed copies are
    * the long-lived table layout, not a per-query step. */
  private val bucketedReady = scala.collection.mutable.Set[(Int, String)]()
  def ensureBucketedTables(s: SparkSession, dir: String): Unit = synchronized {
    import s.implicits._
    val key = (System.identityHashCode(s), dir)
    if (bucketedReady(key)) return
    // In-memory catalog + persistent warehouse dir: drop stale locations
    // before saveAsTable (fresh-JVM runs would otherwise refuse).
    for (tbl <- Seq("graft_li_b", "graft_ord_b")) {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    t(s, dir, "lineitem").select($"l_orderkey", $"l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_b")
    t(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_b")
    bucketedReady += key
  }

  /** Join of two CO-BUCKETED tables: both sides are written bucketed+sorted
    * on the join key, so the sort-merge join requires NO exchange — the
    * 100 TB pre-partitioning path ([[graft.relational.BucketingSpec]] pins
    * the no-Exchange plan shape; this query gates the RESULT through the
    * oracle). Layout setup lives in [[ensureBucketedTables]] (memoized;
    * called untimed by the bench harness). */
  def bucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureBucketedTables(s, dir)
    s.table("graft_li_b").hint("merge")
      .join(s.table("graft_ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(Queries.cents($"l_quantity")).as("qty_cents"))
      .orderBy($"o_orderstatus")
  }

  /** FULL OUTER join with unmatched rows on BOTH sides: BUILDING-segment
    * customers (left-only where the customer never ordered) against per-
    * customer order counts (right-only where the customer is in another
    * segment). Nulls coalesced on both sides — a nullable column must never
    * reach the total ORDER BY (NULLS FIRST vs LAST, see oracle rules). */
  def full(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = t(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey".as("k"), $"c_name")
    val b = t(s, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      .select($"o_custkey".as("k"), $"n_orders")
    a.join(b, Seq("k"), "full")
      .select($"k", coalesce($"c_name", lit("-")).as("name"),
        coalesce($"n_orders", lit(-1L)).as("n_orders"))
      .orderBy($"k")
  }

  /** Salt fan-out for [[skewSalted]] (hot-key split factor). */
  val SkewSalt = 8

  /** SALTED skew join — the manual hot-key treatment for a shuffle join on
    * a pathologically low-cardinality key. `events.event_type` has 5 values,
    * so a plain shuffle join on it lands n/5 rows in 5 tasks no matter how
    * many partitions the shuffle has — the one skew AQE's split-by-size can
    * miss when a single key exceeds every size threshold (AQE subdivides
    * oversized PARTITIONS, but all rows of one key hash to one partition
    * whose split still carries the whole key on one side). The salt splits
    * each hot key across [[SkewSalt]] shuffle partitions: the fact side gets
    * a deterministic per-row salt (`xxhash64(event_id) mod B` — content-
    * derived, reproducible), the dim side is EXPLODED ×B (dim×B stays tiny),
    * and the equi-join runs on `(key, salt)`. Result is salt-invariant by
    * construction; `JoinSkewSpec` pins both the plan shape (exchange on
    * key+salt with broadcast disabled) and salted ≡ unsalted. The query
    * itself is the per-row enrichment a normalization pass needs: each
    * event joined to its type's corpus stats, deviation-from-mean kept in
    * exact scaled integers (`cents·n − Σcents`, no division → no floats). */
  def skewSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val dim = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("type_n"),
        sum(Queries.cents($"value")).as("type_cents"))
    val salted = ev
      .select($"event_id", $"event_type", Queries.cents($"value").as("cents"))
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(SkewSalt.toLong)))
    val dimExp = dim
      .withColumn("salt", explode(sequence(lit(0L), lit(SkewSalt - 1L))))
    salted.join(dimExp, Seq("event_type", "salt"))
      .select($"event_id", $"event_type", $"type_n",
        ($"cents" * $"type_n" - $"type_cents").as("dev_scaled"))
      .orderBy($"event_id")
  }

  /** Pre-join SKEW DIAGNOSTIC — the measurement that decides when
    * [[skewSalted]]'s treatment is warranted, run BEFORE committing a
    * 100 TB shuffle join: per join-key load share vs the fair share, with
    * a SALT/OK verdict per key (share > 2× fair). AQE only sees skew after
    * the shuffle has materialized the skewed map outputs; this is the
    * planning-time read that avoids paying for the first bad run.
    *
    * Shape at scale: ONE map-side-combinable key count (the corpus never
    * moves — partial counts do), a 1-row (total, key-count) aggregate
    * crossJoined back onto the key-cardinality-bounded result. The VERDICT
    * compares unrounded (`n_rows · n_keys > 2 · n_total` ⇔ share > 2× fair)
    * — the basis-point columns are display-only, because `10000 div n_keys`
    * floors to 0 past 10 000 keys and a rounded comparison would flag every
    * key in exactly the high-cardinality regime the diagnostic targets (r9
    * ADVICE). Threshold identical in the oracle. */
  def skewDiagnose(s: SparkSession, dir: String): DataFrame =
    skewDiagnoseOf(Tables.events(s, dir))

  /** [[skewDiagnose]] over any `(event_type)` keyed table — fixture entry
    * point. */
  private[graft] def skewDiagnoseOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val perKey = events.groupBy($"event_type").agg(count(lit(1)).as("n_rows"))
    val tot = perKey.agg(sum($"n_rows").as("n_total"),
      count(lit(1)).as("n_keys")) // 1 row
    perKey.crossJoin(broadcast(tot))
      .select($"event_type", $"n_rows",
        expr("n_rows * 10000L div n_total").as("share_bp"),
        expr("10000L div n_keys").as("fair_bp"),
        // n_rows·n_keys > 2·n_total spelled division-based: the product can
        // overflow int64 silently in non-ANSI Spark at corpus-scale counts
        // (r10 ADVICE — the same silent-vs-loud class as Stats.covLong).
        // Exact: for k ≥ 1, a·k > T ⇔ a > T div k (if a > T div k then
        // a·k ≥ (T div k + 1)·k = T - T mod k + k > T; else a·k ≤ T).
        when($"n_rows" > expr("(2 * n_total) div n_keys"), "SALT")
          .otherwise("OK").as("action"))
      .orderBy($"event_type")
  }

  /** Bounded cross join (dims only). */
  def cross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "nation").crossJoin(t(s, dir, "region"))
      .select($"n_nationkey", $"r_regionkey")
      .orderBy($"n_nationkey", $"r_regionkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> inner _,
    "q_join_sortmerge" -> sortMerge _,
    "q_join_left" -> left _,
    "q_join_semi" -> semi _,
    "q_join_anti" -> anti _,
    "q_join_range" -> range _,
    "q_join_asof" -> asOfCustom _,
    "q_join_asof_left" -> asOfLeft _,
    "q_join_bucketed" -> bucketed _,
    "q_join_full" -> full _,
    "q_join_cross" -> cross _,
    "q_join_skew_salted" -> skewSalted _,
    "q_join_skew_diagnose" -> skewDiagnose _,
  )

  val oracles: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS total_cents
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT a.event_id AS err_id, b.event_id AS pur_id
        |FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts FROM events WHERE event_type = 'error') a
        |JOIN (SELECT event_id, user_id, date_trunc('second', ts) AS ts FROM events WHERE event_type = 'purchase') b
        |ON a.user_id = b.user_id AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY err_id, pur_id""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, o_orderkey FROM (
        |  SELECT e.event_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts FROM events) e
        |  JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_join_asof_left" ->
      """SELECT e.event_id,
        |  CAST(coalesce(o.o_orderkey, -1) AS BIGINT) AS o_orderkey
        |FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts FROM events) e
        |LEFT JOIN (
        |  SELECT event_id, o_orderkey FROM (
        |    SELECT e2.event_id, o2.o_orderkey,
        |      row_number() OVER (PARTITION BY e2.event_id
        |                         ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC) AS rn
        |    FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts FROM events) e2
        |    JOIN orders o2 ON e2.user_id = o2.o_custkey AND o2.o_orderdate <= e2.ts)
        |  WHERE rn = 1) o ON e.event_id = o.event_id
        |ORDER BY e.event_id""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_full" ->
      """SELECT COALESCE(a.k, b.k) AS k,
        |  COALESCE(a.c_name, '-') AS name,
        |  CAST(COALESCE(b.n_orders, -1) AS BIGINT) AS n_orders
        |FROM (SELECT c_custkey AS k, c_name FROM customer
        |      WHERE c_mktsegment = 'BUILDING') a
        |FULL OUTER JOIN (SELECT o_custkey AS k, count(*) AS n_orders
        |                 FROM orders GROUP BY o_custkey) b
        |ON a.k = b.k
        |ORDER BY k""".stripMargin,
    "q_join_cross" ->
      """SELECT n_nationkey, r_regionkey FROM nation CROSS JOIN region
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,
    // The oracle is the UNSALTED join — the salt must be invisible in the
    // result, so the compare itself proves salt-invariance.
    "q_join_skew_salted" ->
      """WITH d AS (SELECT event_type, count(*) AS type_n,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS type_cents
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, CAST(d.type_n AS BIGINT) AS type_n,
        |  CAST(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) * d.type_n - d.type_cents AS BIGINT) AS dev_scaled
        |FROM events e JOIN d USING (event_type)
        |ORDER BY event_id""".stripMargin,
    // per-key load share vs fair share; verdict unrounded (share > 2× fair
    // as n_rows·n_keys > 2·n_total) — the bp columns are display-only
    "q_join_skew_diagnose" ->
      """WITH pk AS (SELECT event_type, count(*) AS n_rows
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
        |  count(*) AS n_keys FROM pk)
        |SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_rows * 10000 // n_total AS BIGINT) AS share_bp,
        |  CAST(10000 // n_keys AS BIGINT) AS fair_bp,
        |  CASE WHEN n_rows > (2 * n_total) // n_keys
        |    THEN 'SALT' ELSE 'OK' END AS action
        |FROM pk, tot ORDER BY event_type""".stripMargin,
  )
}
