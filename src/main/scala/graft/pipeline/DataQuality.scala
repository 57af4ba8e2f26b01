package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-quality validation (the Deequ-on-Spark pattern): a
  * constraint suite over a table evaluated in ONE scan, emitting per-column
  * profile metrics and per-constraint PASS/FAIL verdicts. The reference
  * validates its input only implicitly (a malformed CSV row would throw in
  * the positional parser, `BillingEvent.scala:11-19` cited at
  * `FlinkCEPExample.scala:50-53`); a 100 TB ingest cannot afford
  * throw-on-first-bad-row semantics — it needs MEASURED violation rates and
  * thresholded gate decisions, which is exactly what every production
  * curation pipeline bolts on in front of training-data jobs.
  *
  * Spark-first shape, and the reason this scales:
  *
  *   - Every metric (completeness, uniqueness, range conformance, accepted
  *     values, freshness) is a map-side-combinable aggregate; the whole
  *     metric family is computed by ONE `agg(...)` over ONE pass of the
  *     table (the multi-`countDistinct` plans via Catalyst's Expand — the
  *     one deliberate ×columns blow-up, paid once, instead of one scan per
  *     metric the naive checker runs).
  *   - Referential integrity is the only non-scalar constraint: a broadcast
  *     LEFT join against the dimension's key column folded into the SAME
  *     single aggregate pass (`count(c_custkey)` = matched rows) — the fact
  *     table is never shuffled.
  *   - The verdict table is constraint-count-sized: the single aggregate row
  *     explodes into one row per constraint with integer basis-point
  *     measures against pinned thresholds. Nothing downstream of the scan
  *     is corpus-sized.
  *
  * The validated table is a DERIVED dirty registry (the
  * [[EntityResolution.registryOf]] discipline): deterministic corruption
  * classes planted into `orders` — dropped priorities, negated prices,
  * out-of-domain statuses, dangling customer keys, duplicated rows — so the
  * DuckDB oracle replays corruption → metrics → verdicts end-to-end from
  * the same parquet, and both FAIL and PASS arms are exercised at every SF
  * (both engines compute the identical rates, so verdicts can never split).
  */
object DataQuality {

  /** Per-constraint basis-point thresholds. Chosen ≥ 50 bp away from the
    * planted violation rates (completeness ~1/97 missing → ~9897 bp,
    * RI ~1/127 dangling → ~9921 bp, status ~1/113 out-of-domain → ~9912 bp,
    * price ~1/131 negated → ~9924 bp, dup 1/500 → uniqueness ~9980 bp) so
    * the suite demonstrably FAILS the completeness + referential gates and
    * PASSES the rest; both engines compute identical rates, so the verdict
    * can never disagree between Spark and the oracle. */
  val Thresholds: Seq[(String, Long)] = Seq(
    "accepted_values_status" -> 9800L,
    "completeness_priority" -> 9950L,
    "freshness_orderdate" -> 9990L,
    "non_negative_price" -> 9800L,
    "referential_custkey" -> 9950L,
    "uniqueness_orderkey" -> 9900L,
  )

  /** The dirty validation target: `orders` with five deterministic
    * corruption classes (NULLed priority at key%97, out-of-domain status at
    * key%113, dangling custkey at key%127, negated price at key%131, full
    * duplicate rows at key%500). Derivation is narrow (no shuffle). */
  private[graft] def dirtyOrdersOf(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    val c = orders.select(
      $"o_orderkey".as("okey"),
      when($"o_orderkey" % 127 === 0, $"o_custkey" + 1000000000L)
        .otherwise($"o_custkey").as("ckey"),
      when($"o_orderkey" % 113 === 0, lit("X"))
        .otherwise($"o_orderstatus").as("status"),
      when($"o_orderkey" % 131 === 0, -$"o_totalprice")
        .otherwise($"o_totalprice").as("price"),
      $"o_orderdate".as("odate"),
      when($"o_orderkey" % 97 === 0, lit(null).cast("string"))
        .otherwise($"o_orderpriority").as("priority"))
    c.unionAll(c.filter($"okey" % 500 === 0))
  }

  /** Integer cents (the repo-wide no-raw-doubles determinism contract). */
  private def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Declared query: per-column profile metrics — row count, null count,
    * exact distinct count, min/max (numerics compared numerically, THEN
    * rendered as strings for the mixed-type output column) — for all five
    * registry columns, in one aggregate pass. */
  def metrics(s: SparkSession, dir: String): DataFrame =
    metricsOf(dirtyOrdersOf(Tables.table(s, dir, "orders")))

  private[graft] def metricsOf(dirty: DataFrame): DataFrame = {
    val s = dirty.sparkSession
    import s.implicits._
    // (column, value-expression-for-ordering) — price ordered in cents so
    // min/max strings are integer renderings on both engines.
    val cols: Seq[(String, Column)] = Seq(
      ("ckey", $"ckey"), ("okey", $"okey"),
      ("price_cents", cents($"price")), ("priority", $"priority"),
      ("status", $"status"))
    val aggs = cols.zipWithIndex.flatMap { case ((_, v), i) =>
      Seq(count(v).as(s"nn$i"), countDistinct(v).as(s"nd$i"),
        min(v).cast("string").as(s"mn$i"), max(v).cast("string").as(s"mx$i"))
    }
    val one = dirty.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = cols.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("col_name"), $"n".as("n_rows"),
        ($"n" - col(s"nn$i")).as("n_nulls"), col(s"nd$i").as("n_distinct"),
        col(s"mn$i").as("min_v"), col(s"mx$i").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("r")).select($"r.*")
      .orderBy($"col_name")
  }

  /** Declared query: the thresholded constraint verdicts — six constraints
    * measured in basis points from ONE aggregate over the dirty registry
    * (RI via a broadcast left join folded into the same pass), each row
    * carrying (measured_bp, threshold_bp, verdict). */
  def verdict(s: SparkSession, dir: String): DataFrame =
    verdictOf(dirtyOrdersOf(Tables.table(s, dir, "orders")),
      Tables.table(s, dir, "customer").select(col("c_custkey")))

  private[graft] def verdictOf(dirty: DataFrame, custKeys: DataFrame): DataFrame = {
    val s = dirty.sparkSession
    import s.implicits._
    val j = dirty.join(broadcast(custKeys),
      dirty("ckey") === custKeys("c_custkey"), "left")
    val one = j.agg(
      count(lit(1)).as("n"),
      sum(when($"status".isin("O", "F", "P"), 1L).otherwise(0L)).as("m_st"),
      count($"priority").as("m_pri"),
      sum(when($"odate".between(lit("1992-01-01").cast("timestamp"),
        lit("2005-12-31").cast("timestamp")), 1L).otherwise(0L)).as("m_dt"),
      sum(when($"price" >= 0, 1L).otherwise(0L)).as("m_pos"),
      count($"c_custkey").as("m_ri"),
      countDistinct($"okey").as("m_uk"))
    val measures = Seq("m_st", "m_pri", "m_dt", "m_pos", "m_ri", "m_uk")
    val rows = Thresholds.zip(measures).map { case ((cname, thr), m) =>
      val bp = expr(s"$m * 10000L div n")
      struct(lit(cname).as("check_name"), bp.as("measured_bp"),
        lit(thr).as("threshold_bp"),
        when(bp >= thr, "PASS").otherwise("FAIL").as("verdict"))
    }
    one.select(explode(array(rows: _*)).as("r")).select($"r.*")
      .orderBy($"check_name")
  }

  /** Per-PARTITION quality trend — the month-bucketed view of the same
    * constraints, which is how an operator localizes WHEN a violation
    * class entered the pipe (a bad upstream deploy shows as a cliff in
    * one month's bp, invisible in the corpus-wide verdict average). On a
    * date-partitioned 100 TB table this is the per-partition audit that
    * runs incrementally on only the partitions an ingest touched. ONE
    * map-side-combinable aggregate keyed by the calendar-bounded month
    * key. */
  def byPartition(s: SparkSession, dir: String): DataFrame =
    byPartitionOf(dirtyOrdersOf(Tables.table(s, dir, "orders")))

  private[graft] def byPartitionOf(dirty: DataFrame): DataFrame = {
    val s = dirty.sparkSession
    import s.implicits._
    dirty
      .groupBy((year($"odate") * 100 + month($"odate")).as("ym"))
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(CASE WHEN status IN ('O','F','P') THEN 1 ELSE 0 END)" +
          " * 10000L div count(1)").as("status_bp"),
        expr("count(priority) * 10000L div count(1)").as("pri_bp"),
        expr("sum(CASE WHEN price >= 0 THEN 1 ELSE 0 END)" +
          " * 10000L div count(1)").as("price_bp"))
      .orderBy($"ym")
  }

  /** CROSS-TABLE consistency audit — the constraint class the single-table
    * suite cannot see: fact-to-fact agreement between `orders` and
    * `lineitem` (every lineitem resolves to an order; every order has
    * lines; ships never precede their order; the stored order total agrees
    * with the recomputed line sum within 1%). On this driver corpus the
    * measured rates are BRUTALLY honest — ~49% of lineitems ship before
    * their order date and stored totals are unrelated to line sums — which
    * is exactly the point: the audit reports what holds, the thresholds
    * decide what's acceptable, and both engines compute identical rates so
    * verdicts cannot split.
    *
    * Shape at scale (the minimal-shuffle spelling): ONE co-partitioned
    * shuffle join on the order key (SMJ of two fact tables — the join
    * every warehouse already pays), with the per-order aggregate riding
    * the join's key partitioning (group key = join key → no re-exchange);
    * per-row line cents are floored BEFORE summation so the order-total
    * comparison is an order-independent integer sum; the lineitem
    * denominator comes from a scan-only count (no join needed to count a
    * table); two 1-row aggregates cross onto the 4-row verdict output.
    * Orphan lineitems are counted as `n_lineitems − matched` — no second
    * join, no null-key hot group. */
  def crossAudit(s: SparkSession, dir: String): DataFrame =
    crossAuditOf(Tables.table(s, dir, "orders"), Tables.table(s, dir, "lineitem"))

  /** Thresholds for [[crossAudit]]: RI passes on this corpus; the other
    * three demonstrably fail (childless orders ~170 bp, ship-date
    * inversions ~4860 bp, and nearly every order-with-lines misses its
    * stored total by >1%). Each rate uses the denominator of the
    * population that can actually violate it — total_matches divides by
    * orders WITH lines, so a childless order is charged only to
    * order_has_lineitem. */
  val CrossThresholds: Seq[(String, Long)] = Seq(
    "order_has_lineitem" -> 9950L,
    "ri_lineitem_order" -> 9950L,
    "ship_after_order" -> 9900L,
    "total_matches_sum_1pct" -> 9000L,
  )

  private[graft] def crossAuditOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    val o = orders.select($"o_orderkey", $"o_orderdate".as("odate"),
      cents($"o_totalprice").as("tp"))
    val l = lineitem.select($"l_orderkey", $"l_shipdate".as("ship"),
      floor($"l_extendedprice" * (lit(1.0) - $"l_discount")
        * (lit(1.0) + $"l_tax") * lit(100.0) + lit(0.5)).cast("long").as("lc"))
    val per = l.join(o, l("l_orderkey") === o("o_orderkey"), "right_outer")
      .groupBy($"o_orderkey", $"tp")
      .agg(count($"l_orderkey").as("n_li"),
        sum(when($"ship" >= $"odate", 1L).otherwise(0L)).as("n_d"),
        sum($"lc").as("cp"))
    val g = per.agg(
      count(lit(1)).as("n_orders"),
      sum(when($"n_li" > 0, 1L).otherwise(0L)).as("n_wl"),
      sum($"n_li").as("n_lm"),
      sum($"n_d").as("n_do"),
      sum(when($"n_li" > 0 && abs($"tp" - $"cp") * 100 <= $"tp", 1L)
        .otherwise(0L)).as("n_to"))
    val tot = l.agg(count(lit(1)).as("n_l")) // scan-only lineitem count
    val one = g.crossJoin(broadcast(tot))
    val bps = Seq(
      expr("n_wl * 10000L div n_orders"), // order_has_lineitem
      expr("n_lm * 10000L div n_l"),      // ri_lineitem_order
      expr("n_do * 10000L div n_lm"),     // ship_after_order (matched denom)
      // denominator = orders WITH lines: a childless order can never satisfy
      // the sum predicate and is already counted by order_has_lineitem —
      // an n_orders denominator would double-charge it to two violation
      // classes (r9 ADVICE)
      expr("n_to * 10000L div n_wl"))     // total_matches_sum_1pct
    val rows = CrossThresholds.zip(bps).map { case ((cname, thr), bp) =>
      struct(lit(cname).as("check_name"), bp.as("measured_bp"),
        lit(thr).as("threshold_bp"),
        when(bp >= thr, "PASS").otherwise("FAIL").as("verdict"))
    }
    one.select(explode(array(rows: _*)).as("r")).select($"r.*")
      .orderBy($"check_name")
  }

  /** Example rows per violation class for [[verdict]]. */
  val ExamplesPerCheck = 10

  /** TRIAGE EXAMPLES — the step after a FAIL verdict: the first
    * [[ExamplesPerCheck]] violating rows (smallest key — deterministic)
    * per constraint class, with the offending value rendered. A rate
    * says the feed is broken; examples say HOW, and a pager ticket with
    * ten concrete rows beats one with a percentage.
    *
    * Shape at scale: one filter + `ORDER BY okey LIMIT k` per constraint
    * over the shared registry — each arm collapses to
    * TakeOrderedAndProject (no corpus sort, no single hot partition; the
    * per-check window spelling would put ALL violations of one check
    * into one window partition, which is exactly the skew this avoids),
    * unioned into the ≤ checks·k output. */
  def examples(s: SparkSession, dir: String): DataFrame =
    examplesOf(dirtyOrdersOf(Tables.table(s, dir, "orders")),
      Tables.table(s, dir, "customer").select(col("c_custkey")))

  private[graft] def examplesOf(dirty: DataFrame, custKeys: DataFrame): DataFrame = {
    val s = dirty.sparkSession
    import s.implicits._
    def arm(name: String, flt: org.apache.spark.sql.Column,
        value: org.apache.spark.sql.Column): DataFrame =
      dirty.filter(flt)
        .select(lit(name).as("check_name"), $"okey",
          value.cast("string").as("bad_value"))
        .orderBy($"okey").limit(ExamplesPerCheck)
    val ri = dirty.join(broadcast(custKeys),
        dirty("ckey") === custKeys("c_custkey"), "left")
      .filter($"c_custkey".isNull)
      .select(lit("referential_custkey").as("check_name"), $"okey",
        $"ckey".cast("string").as("bad_value"))
      .orderBy($"okey").limit(ExamplesPerCheck)
    arm("accepted_values_status", !$"status".isin("O", "F", "P"), $"status")
      .unionAll(arm("completeness_priority", $"priority".isNull, $"priority"))
      .unionAll(arm("non_negative_price", $"price" < 0, cents($"price")))
      .unionAll(ri)
      .orderBy($"check_name", $"okey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_metrics" -> metrics _,
    "q_dq_verdict" -> verdict _,
    "q_dq_by_partition" -> byPartition _,
    "q_dq_cross" -> crossAudit _,
    "q_dq_examples" -> examples _,
  )

  /** Corruption replay shared by both oracles. */
  private val dirtyCte =
    """dirty AS (
      |  SELECT o_orderkey AS okey,
      |    CASE WHEN o_orderkey % 127 = 0 THEN o_custkey + 1000000000
      |         ELSE o_custkey END AS ckey,
      |    CASE WHEN o_orderkey % 113 = 0 THEN 'X'
      |         ELSE o_orderstatus END AS status,
      |    CASE WHEN o_orderkey % 131 = 0 THEN -o_totalprice
      |         ELSE o_totalprice END AS price,
      |    o_orderdate AS odate,
      |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |         ELSE o_orderpriority END AS priority
      |  FROM orders),
      |d2 AS (SELECT * FROM dirty
      |       UNION ALL SELECT * FROM dirty WHERE okey % 500 = 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    // per-check ORDER BY okey LIMIT k arms over the same dirty registry
    "q_dq_examples" ->
      s"""WITH $dirtyCte,
         |a1 AS (SELECT 'accepted_values_status' AS check_name, okey,
         |    status AS bad_value FROM d2
         |  WHERE status NOT IN ('O','F','P') ORDER BY okey LIMIT $ExamplesPerCheck),
         |a2 AS (SELECT 'completeness_priority', okey, priority FROM d2
         |  WHERE priority IS NULL ORDER BY okey LIMIT $ExamplesPerCheck),
         |a3 AS (SELECT 'non_negative_price', okey,
         |    CAST(CAST(floor(price * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
         |  FROM d2 WHERE price < 0 ORDER BY okey LIMIT $ExamplesPerCheck),
         |a4 AS (SELECT 'referential_custkey', d2.okey,
         |    CAST(d2.ckey AS VARCHAR)
         |  FROM d2 LEFT JOIN customer c ON c.c_custkey = d2.ckey
         |  WHERE c.c_custkey IS NULL ORDER BY d2.okey LIMIT $ExamplesPerCheck)
         |SELECT check_name, okey, bad_value FROM (
         |  SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |  UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4)
         |ORDER BY check_name, okey""".stripMargin,
    // the same join-and-aggregate replay: per-row cents floored before the
    // order sum, thresholds identical
    "q_dq_cross" ->
      """WITH o AS (SELECT o_orderkey, o_orderdate AS odate,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS tp
        |  FROM orders),
        |l AS (SELECT l_orderkey, l_shipdate AS ship,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT) AS lc
        |  FROM lineitem),
        |per AS (SELECT o.o_orderkey, o.tp,
        |    count(l.l_orderkey) AS n_li,
        |    sum(CASE WHEN l.ship >= o.odate THEN 1 ELSE 0 END) AS n_d,
        |    sum(l.lc) AS cp
        |  FROM l RIGHT JOIN o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |g AS (SELECT count(*) AS n_orders,
        |    sum(CASE WHEN n_li > 0 THEN 1 ELSE 0 END) AS n_wl,
        |    CAST(sum(n_li) AS BIGINT) AS n_lm,
        |    CAST(sum(n_d) AS BIGINT) AS n_do,
        |    sum(CASE WHEN n_li > 0 AND abs(tp - cp) * 100 <= tp
        |        THEN 1 ELSE 0 END) AS n_to
        |  FROM per),
        |tot AS (SELECT count(*) AS n_l FROM l)
        |SELECT check_name, measured_bp, threshold_bp,
        |  CASE WHEN measured_bp >= threshold_bp THEN 'PASS' ELSE 'FAIL' END
        |    AS verdict
        |FROM (
        |  SELECT 'order_has_lineitem' AS check_name,
        |    CAST(n_wl * 10000 // n_orders AS BIGINT) AS measured_bp,
        |    CAST(9950 AS BIGINT) AS threshold_bp FROM g, tot
        |  UNION ALL SELECT 'ri_lineitem_order',
        |    CAST(n_lm * 10000 // n_l AS BIGINT), 9950 FROM g, tot
        |  UNION ALL SELECT 'ship_after_order',
        |    CAST(n_do * 10000 // n_lm AS BIGINT), 9900 FROM g, tot
        |  UNION ALL SELECT 'total_matches_sum_1pct',
        |    CAST(n_to * 10000 // n_wl AS BIGINT), 9000 FROM g, tot)
        |ORDER BY check_name""".stripMargin,
    "q_dq_by_partition" ->
      s"""WITH $dirtyCte
         |SELECT CAST(year(odate) * 100 + month(odate) AS INT) AS ym,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN status IN ('O','F','P') THEN 1 ELSE 0 END)
         |    * 10000 // count(*) AS BIGINT) AS status_bp,
         |  CAST(count(priority) * 10000 // count(*) AS BIGINT) AS pri_bp,
         |  CAST(sum(CASE WHEN price >= 0 THEN 1 ELSE 0 END)
         |    * 10000 // count(*) AS BIGINT) AS price_bp
         |FROM d2 GROUP BY 1 ORDER BY ym""".stripMargin,
    "q_dq_metrics" ->
      s"""WITH $dirtyCte,
         |m AS (SELECT count(*) AS n,
         |  count(ckey) AS nn0, count(DISTINCT ckey) AS nd0,
         |    CAST(min(ckey) AS VARCHAR) AS mn0, CAST(max(ckey) AS VARCHAR) AS mx0,
         |  count(okey) AS nn1, count(DISTINCT okey) AS nd1,
         |    CAST(min(okey) AS VARCHAR) AS mn1, CAST(max(okey) AS VARCHAR) AS mx1,
         |  count(price) AS nn2,
         |    count(DISTINCT CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS nd2,
         |    CAST(min(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS VARCHAR) AS mn2,
         |    CAST(max(CAST(floor(price * 100.0 + 0.5) AS BIGINT)) AS VARCHAR) AS mx2,
         |  count(priority) AS nn3, count(DISTINCT priority) AS nd3,
         |    min(priority) AS mn3, max(priority) AS mx3,
         |  count(status) AS nn4, count(DISTINCT status) AS nd4,
         |    min(status) AS mn4, max(status) AS mx4
         |  FROM d2)
         |SELECT col_name, n_rows, n_nulls, n_distinct, min_v, max_v FROM (
         |  SELECT 'ckey' AS col_name, n AS n_rows, n - nn0 AS n_nulls,
         |         nd0 AS n_distinct, mn0 AS min_v, mx0 AS max_v FROM m
         |  UNION ALL SELECT 'okey', n, n - nn1, nd1, mn1, mx1 FROM m
         |  UNION ALL SELECT 'price_cents', n, n - nn2, nd2, mn2, mx2 FROM m
         |  UNION ALL SELECT 'priority', n, n - nn3, nd3, mn3, mx3 FROM m
         |  UNION ALL SELECT 'status', n, n - nn4, nd4, mn4, mx4 FROM m)
         |ORDER BY col_name""".stripMargin,
    "q_dq_verdict" ->
      s"""WITH $dirtyCte,
         |m AS (SELECT count(*) AS n,
         |  sum(CASE WHEN status IN ('O','F','P') THEN 1 ELSE 0 END) AS m_st,
         |  count(priority) AS m_pri,
         |  sum(CASE WHEN odate BETWEEN TIMESTAMP '1992-01-01'
         |        AND TIMESTAMP '2005-12-31' THEN 1 ELSE 0 END) AS m_dt,
         |  sum(CASE WHEN price >= 0 THEN 1 ELSE 0 END) AS m_pos,
         |  count(c.c_custkey) AS m_ri,
         |  count(DISTINCT okey) AS m_uk
         |  FROM d2 LEFT JOIN customer c ON c.c_custkey = d2.ckey)
         |SELECT check_name, measured_bp, threshold_bp,
         |  CASE WHEN measured_bp >= threshold_bp THEN 'PASS' ELSE 'FAIL' END
         |    AS verdict
         |FROM (
         |  SELECT 'accepted_values_status' AS check_name,
         |         CAST(m_st * 10000 // n AS BIGINT) AS measured_bp,
         |         CAST(9800 AS BIGINT) AS threshold_bp FROM m
         |  UNION ALL SELECT 'completeness_priority',
         |         CAST(m_pri * 10000 // n AS BIGINT), 9950 FROM m
         |  UNION ALL SELECT 'freshness_orderdate',
         |         CAST(m_dt * 10000 // n AS BIGINT), 9990 FROM m
         |  UNION ALL SELECT 'non_negative_price',
         |         CAST(m_pos * 10000 // n AS BIGINT), 9800 FROM m
         |  UNION ALL SELECT 'referential_custkey',
         |         CAST(m_ri * 10000 // n AS BIGINT), 9950 FROM m
         |  UNION ALL SELECT 'uniqueness_orderkey',
         |         CAST(m_uk * 10000 // n AS BIGINT), 9900 FROM m)
         |ORDER BY check_name""".stripMargin,
  )
}
