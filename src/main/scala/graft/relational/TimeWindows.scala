package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time window inventory in batch form: tumbling / sliding / session
  * windows over the events table (the batch analogs of the streaming
  * operators; identical grouping semantics, no watermark needed on bounded
  * input). Session-window semantics (verified empirically at sf0.1, user 511,
  * events exactly 30 min apart): Spark MERGES sessions at the exact-gap
  * boundary — the session interval end is inclusive for merging — so a new
  * session starts only when the gap is STRICTLY GREATER than the threshold.
  * All timestamps are second-truncated first (ns-parquet caveat,
  * FIXTURES.md §B.1).
  */
object TimeWindows {

  private def ev(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).withColumn("ts_sec", date_trunc("second", $"ts"))
  }

  /** Tumbling 1h window × event_type. */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(window($"ts_sec", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("wstart"), $"event_type", $"cnt")
      .orderBy($"wstart", $"event_type")
  }

  /** Sliding 1h window, 15min slide (each event lands in 4 windows). */
  def sliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(window($"ts_sec", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("wstart"), $"event_type", $"cnt")
      .orderBy($"wstart", $"event_type")
  }

  /** Per-user session windows with a 30-minute inactivity gap. */
  def session(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(session_window($"ts_sec", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .select($"user_id", $"session_window.start".as("session_start"), $"cnt")
      .orderBy($"user_id", $"session_start")
  }

  /** Exact dedup: first event per (user, type, hour) via row_number = 1 —
    * the `dropDuplicates`-with-deterministic-survivor shape. */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type", $"hstart")
      .orderBy($"ts_sec", $"event_id")
    ev(s, dir)
      .withColumn("hstart", date_trunc("hour", $"ts_sec"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"hstart", $"event_id")
      .orderBy($"user_id", $"event_type", $"hstart")
  }

  /** Events per count window for [[countWindow]] — small so window rollover
    * is exercised at every SF (most users have ≥ 6 events at sf0.001). */
  val CountWindowN = 5

  /** COUNT windows — Flink's `keyedStream.countWindow(n)`: per user, the
    * event sequence (ordered by event time, event_id tiebreak) chopped into
    * consecutive windows of [[CountWindowN]] events; the tail window is
    * partial. The one window-function pass per user partition is the same
    * at-scale shape as [[dedup]]'s survivor ranking: the sort is per-user,
    * never global, and everything after is a map-side-combinable aggregate.
    * First/last events per window via the combinable min/max(struct(rn, id))
    * argmin trick — no second window pass. */
  def countWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("win_id", expr(s"(rn - 1) div $CountWindowN"))
      .groupBy($"user_id", $"win_id")
      .agg(count(lit(1)).as("n_events"),
        min(struct($"rn", $"event_id")).as("fst"),
        max(struct($"rn", $"event_id")).as("lst"))
      .select($"user_id", $"win_id", $"n_events",
        $"fst.event_id".as("first_ev"), $"lst.event_id".as("last_ev"))
      .orderBy($"user_id", $"win_id")
  }

  /** Corpus-wide FUNNEL conversion aggregate — the relational complement of
    * the CEP funnel (`q_cep_funnel` emits per-match rows; product analytics
    * wants the conversion RATES): per user, the earliest error, the
    * earliest view strictly after it, and the earliest purchase strictly
    * after that, all within 1 hour of the error; one output row with stage
    * counts and step conversions in basis points. Shape: one narrow scan
    * split by type into three per-user min aggregates chained by two
    * broadcast-free equi-joins on user_id (stage tables shrink user-wise at
    * every step) — no window function, no self-join fan-out; the 100 TB
    * cost is three map-side-combinable mins on the same user key. */
  /** The three chained funnel stage tables (shared by [[funnelSteps]] and
    * [[funnelLatency]]): per user, earliest error t1, earliest in-window
    * view t2 after it, earliest in-window purchase t3 after that. */
  private def funnelStages(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val e = ev(s, dir).select($"user_id", $"event_type", $"ts_sec")
    val s1 = e.filter($"event_type" === "error")
      .groupBy($"user_id").agg(min($"ts_sec").as("t1"))
    val s2 = e.filter($"event_type" === "view")
      .join(s1, "user_id")
      .filter($"ts_sec" > $"t1" && $"ts_sec" <= $"t1" + expr("INTERVAL 1 HOUR"))
      .groupBy($"user_id").agg(min($"t1").as("t1"), min($"ts_sec").as("t2"))
    val s3 = e.filter($"event_type" === "purchase")
      .join(s2, "user_id")
      .filter($"ts_sec" > $"t2" && $"ts_sec" <= $"t1" + expr("INTERVAL 1 HOUR"))
      .groupBy($"user_id").agg(min($"t1").as("t1"), min($"ts_sec").as("t3"))
    (s1, s2, s3)
  }

  def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (s1, s2, s3) = funnelStages(s, dir)
    s1.agg(count(lit(1)).as("n_error")).crossJoin(
        s2.agg(count(lit(1)).as("n_view")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase")))
      .select($"n_error", $"n_view", $"n_purchase",
        // empty upstream stage → 0 bp, not divide-by-zero (sf0.001 has
        // errors but no in-window purchases)
        when($"n_error" === 0L, 0L)
          .otherwise(expr("(n_view * 10000L) div n_error")).as("conv12_bp"),
        when($"n_view" === 0L, 0L)
          .otherwise(expr("(n_purchase * 10000L) div n_view")).as("conv23_bp"))
  }

  /** CONVERSION LATENCY distribution — the "how fast" companion of
    * [[funnelSteps]]' "how many": per activating user, the signup→first-
    * purchase delay in seconds at two window tiers (1 h and 24 h — the
    * sensitivity pair a growth dashboard plots), bucketed into exact
    * power-of-two bins (`length(bin(sec)) − 1` — the integer floor-log₂
    * spelling both engines compute identically, the `q_quantile_merge`
    * convention) and counted per (window, bucket). Conversion RATES alone
    * hide a funnel whose survivors take an hour; the latency histogram is
    * where the time-to-convert regression shows. Shape: two chained
    * per-user min aggregates (the [[funnelSteps]] stage shape), one
    * narrow projection, one map-side-combinable (window, bucket)-bounded
    * count — delays are strictly ≥ 1 s (stage ordering is strict), so
    * the bucket expression is total. */
  def funnelLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select($"user_id", $"event_type", $"ts_sec")
    val su = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_sec").as("t1"))
    def tier(name: String, hours: Int) =
      e.filter($"event_type" === "purchase")
        .join(su, "user_id")
        .filter($"ts_sec" > $"t1" &&
          $"ts_sec" <= $"t1" + expr(s"INTERVAL $hours HOUR"))
        .groupBy($"user_id").agg(min($"t1").as("t1"), min($"ts_sec").as("t2"))
        .select(lit(name).as("win"),
          (unix_timestamp($"t2") - unix_timestamp($"t1")).as("sec"))
    tier("01h", 1).unionAll(tier("24h", 24))
      .withColumn("bucket_lo", expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(sec)) - 1 AS INT))"))
      .groupBy($"win", $"bucket_lo")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"win", $"bucket_lo")
  }

  /** Retention COHORTS: users grouped by first-activity day, counted by
    * day offset from it — the second classic event-analytics aggregate
    * next to [[funnelSteps]]. Shape: per-user first-seen day (one
    * map-side-combinable min), joined back on user_id, distinct
    * (cohort, offset, user) collapsed by one aggregate — cohort table
    * cardinality is days × horizon, never user count. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
      .select($"user_id", to_date($"ts_sec").as("d"))
    val first = e.groupBy($"user_id").agg(min($"d").as("cohort"))
    e.join(first, "user_id")
      .select($"user_id", $"cohort", datediff($"d", $"cohort").as("day_off"))
      .filter($"day_off" <= 7)
      .distinct()
      .groupBy($"cohort", $"day_off")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort", $"day_off")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention" -> retention _,
    "q_funnel_steps" -> funnelSteps _,
    "q_funnel_latency" -> funnelLatency _,
    "q_window_count" -> countWindow _,
    "q_window_tumbling" -> tumbling _,
    "q_window_sliding" -> sliding _,
    "q_window_session" -> session _,
    "q_dedup" -> dedup _,
  )

  val oracles: Map[String, String] = Map(
    "q_retention" ->
      """WITH e AS (SELECT user_id,
        |    CAST(date_trunc('day', date_trunc('second', ts)) AS DATE) AS d
        |  FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id),
        |o AS (SELECT DISTINCT e.user_id, f.cohort,
        |    date_diff('day', f.cohort, e.d) AS day_off
        |  FROM e JOIN f ON f.user_id = e.user_id
        |  WHERE date_diff('day', f.cohort, e.d) <= 7)
        |SELECT cohort, CAST(day_off AS INT) AS day_off,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM o GROUP BY cohort, day_off ORDER BY cohort, day_off""".stripMargin,
    // signup→purchase activation delays at two window tiers, bucketed by
    // length(bin(sec))−1
    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, date_trunc('second', ts) AS ts
        |  FROM events),
        |su AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |lat AS (
        |  SELECT '01h' AS win,
        |    CAST(epoch(min(e.ts)) - epoch(min(su.t1)) AS BIGINT) AS sec
        |  FROM e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > su.t1 AND e.ts <= su.t1 + INTERVAL '1 hour'
        |  GROUP BY e.user_id
        |  UNION ALL
        |  SELECT '24h',
        |    CAST(epoch(min(e.ts)) - epoch(min(su.t1)) AS BIGINT)
        |  FROM e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > su.t1 AND e.ts <= su.t1 + INTERVAL '24 hour'
        |  GROUP BY e.user_id)
        |SELECT win,
        |  CAST(1 AS BIGINT) << CAST(length(bin(sec)) - 1 AS INT) AS bucket_lo,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM lat GROUP BY win, bucket_lo ORDER BY win, bucket_lo""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, date_trunc('second', ts) AS ts
        |  FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'error' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(e.ts) AS t2
        |  FROM e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'view'
        |    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL '1 hour'
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL '1 hour'
        |  GROUP BY e.user_id)
        |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_error,
        |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view,
        |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase,
        |  CAST(CASE WHEN (SELECT count(*) FROM s1) = 0 THEN 0
        |    ELSE ((SELECT count(*) FROM s2) * 10000)
        |      // (SELECT count(*) FROM s1) END AS BIGINT) AS conv12_bp,
        |  CAST(CASE WHEN (SELECT count(*) FROM s2) = 0 THEN 0
        |    ELSE ((SELECT count(*) FROM s3) * 10000)
        |      // (SELECT count(*) FROM s2) END AS BIGINT) AS conv23_bp""".stripMargin,
    "q_window_count" ->
      s"""WITH s AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts
         |  FROM events),
         |r AS (SELECT user_id, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM s)
         |SELECT user_id, CAST((rn - 1) // $CountWindowN AS BIGINT) AS win_id,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  arg_min(event_id, rn) AS first_ev,
         |  arg_max(event_id, rn) AS last_ev
         |FROM r GROUP BY user_id, (rn - 1) // $CountWindowN
         |ORDER BY user_id, win_id""".stripMargin,
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', date_trunc('second', ts)) AS wstart,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "q_window_sliding" ->
      """WITH s AS (SELECT date_trunc('second', ts) AS ts, event_type FROM events)
        |SELECT CAST(time_bucket(INTERVAL '15 minutes', s.ts)
        |         - k.k * INTERVAL '15 minutes' AS TIMESTAMP) AS wstart,
        |  event_type, count(*) AS cnt
        |FROM s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        |GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "q_window_session" ->
      """WITH s AS (SELECT user_id, date_trunc('second', ts) AS ts FROM events),
        |brk AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS b
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grp AS (SELECT user_id, ts,
        |    sum(b) OVER (PARTITION BY user_id ORDER BY ts
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM brk)
        |SELECT user_id, min(ts) AS session_start, count(*) AS cnt
        |FROM grp GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_dedup" ->
      """SELECT user_id, event_type, hstart, event_id FROM (
        |  SELECT user_id, event_type,
        |    date_trunc('hour', date_trunc('second', ts)) AS hstart, event_id,
        |    row_number() OVER (
        |      PARTITION BY user_id, event_type, date_trunc('hour', date_trunc('second', ts))
        |      ORDER BY date_trunc('second', ts), event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type, hstart""".stripMargin,
  )
}
