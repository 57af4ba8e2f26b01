package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence/path analytics over the events stream — the aggregate
  * complements of the CEP operator: CEP extracts individual matching
  * episodes; these queries summarize the WHOLE behavior graph (where do
  * users go next, and which touchpoint gets credit for a conversion).
  */
object Paths {

  /** Session gap bound for [[transitions]] — adjacent events further apart
    * than this are different journeys, not a transition (matches the
    * session-window gap of `q_window_session`). */
  val TransitionGapMin = 30

  /** First-order Markov transition matrix of the event-type sequence: per
    * user, consecutive (by event time, event_id tiebreak) event pairs
    * within [[TransitionGapMin]] minutes, counted into the type×type
    * matrix with row-conditional probabilities in integer basis points —
    * the navigation-flow summary (and the empirical transition model a
    * next-event predictor starts from).
    *
    * Shape at scale: ONE user-key shuffle + per-user window (each
    * partition sorts one user's slice, never a global order), then a
    * map-side-combinable count into the TYPE²-BOUNDED matrix; the
    * row-margin window runs over that tiny aggregated frame (the
    * freqItems precedent), not the corpus. */
  def transitions(s: SparkSession, dir: String): DataFrame =
    transitionsOf(Tables.events(s, dir))

  /** [[transitions]] over any `(user_id, ts, event_type)` events table —
    * fixture entry point. */
  def transitionsOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val pairs = events
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts_sec"))
      .withColumn("src", lag($"event_type", 1).over(w))
      .withColumn("gap_s",
        unix_timestamp($"ts_sec") - unix_timestamp(lag($"ts_sec", 1).over(w)))
      .filter($"src".isNotNull && $"gap_s" <= TransitionGapMin * 60L)
    pairs
      .groupBy($"src", $"event_type".as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob_bp", expr("(cnt * 10000L) div sum(cnt) over (partition by src)"))
      .select($"src", $"dst", $"cnt", $"prob_bp")
      .orderBy($"src", $"dst")
  }

  /** Attribution lookback for [[attribution]]. */
  val AttributionWindowMin = 60

  /** LAST-TOUCH conversion attribution: each purchase is credited to the
    * latest non-purchase event of the same user within the preceding
    * [[AttributionWindowMin]] minutes (ties by event_id — the LSN
    * tiebreak); purchases with no touchpoint in the window count as
    * `(direct)`. Output: conversions per channel — the table every
    * marketing-analytics pipeline reconciles against.
    *
    * Shape at scale: purchases ⋈ events is a user-key equi-join with a
    * time-range residual (the `q_join_range` shape — state/width bounded
    * by the window horizon), and the per-purchase winner is ONE
    * map-side-combinable `max(struct(ts, id, type))` argmax — no window
    * function, no per-purchase sort; the direct-conversion remainder is a
    * left join against the purchase table. */
  def attribution(s: SparkSession, dir: String): DataFrame =
    attributionOf(Tables.events(s, dir))

  /** [[attribution]] over any `(user_id, ts, event_type)` events table —
    * fixture entry point. */
  def attributionOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val e = events.select($"user_id", $"event_id", $"event_type",
      date_trunc("second", $"ts").as("ts_sec"))
    val pur = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"ts_sec".as("pts"))
    val touch = e.filter($"event_type" =!= "purchase")
      .select($"user_id", $"event_id".as("eid"), $"event_type".as("ch"),
        $"ts_sec".as("ets"))
    val best = pur.join(touch, Seq("user_id"))
      .filter($"ets" <= $"pts" &&
        $"ets" >= $"pts" - expr(s"INTERVAL $AttributionWindowMin MINUTES"))
      .groupBy($"pid")
      .agg(max(struct($"ets", $"eid", $"ch")).as("m"))
      .select($"pid", $"m.ch".as("channel"))
    pur.join(best, Seq("pid"), "left")
      .select(coalesce($"channel", lit("(direct)")).as("channel"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"channel")
  }

  /** SESSIONIZATION — the explicit session-table build every
    * event-analytics pipeline runs first (funnel, retention, and
    * attribution all consume it): per user, activity splits into sessions
    * at inactivity gaps > [[TransitionGapMin]] minutes, and each session
    * materializes as ONE numbered row with its span and composition
    * (event count, purchase count, duration). Unlike `q_window_session`
    * (Spark's session_window AGGREGATION) this emits the session DIMENSION
    * — stable per-user session ids downstream joins key on.
    *
    * Shape at scale: gap-flag lag window and the running session-number
    * sum ride ONE (user) exchange + sort; the per-session rollup then
    * re-keys to (user, session) — a second exchange, but of
    * events-sized data reduced map-side (the same two-exchange plan
    * Spark's own session_window lowers to). No corpus sort, no window
    * re-exchange between the two window passes. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables.events(s, dir))

  /** [[sessionize]] over any `(user_id, ts, event_type, event_id)` events
    * table — fixture entry point. */
  def sessionizeOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    events
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_sec"))
      .withColumn("new_sess",
        when($"ts_sec" - lag($"ts_sec", 1).over(w) > TransitionGapMin * 60L
          || lag($"ts_sec", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts_sec").as("start_sec"), max($"ts_sec").as("end_sec"),
        count(lit(1)).as("n_events"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .withColumn("duration_s", $"end_sec" - $"start_sec")
      .orderBy($"user_id", $"session_id")
  }

  /** SEQUENTIAL-PATTERN SUPPORT (the GSP/PrefixSpan support primitive over
    * the type alphabet): for every ordered event-type pair ⟨A → B⟩, the
    * number of users whose history contains A strictly before B — the
    * SUBSEQUENCE relation, not [[transitions]]' adjacency (A → B counts
    * here even with a thousand events between them). The per-user existence
    * test `∃ tA < tB` collapses to `min(ts | A) < max(ts | B)`, so the
    * whole mining pass needs only first/last occurrence per (user, type).
    *
    * Shape at scale: ONE map-side-combinable (user, type) aggregate reduces
    * the corpus to ≤ |alphabet| rows per user; the pair step is a self
    * equi-join ON USER of that reduced table (per-user fan-out bounded by
    * |alphabet|² — 25 here — never by event count); the support count
    * re-aggregates into the alphabet²-bounded matrix, map-side combinable
    * again. Support shares are exact integer basis points over the
    * distinct-user count (one scalar crossed onto the 25-row result).
    * Timestamps are second-truncated on both engines (the ns-parquet
    * caveat), and "before" is strict at second granularity — the declared
    * semantic, identical in the oracle. */
  def seqSupport(s: SparkSession, dir: String): DataFrame =
    seqSupportOf(Tables.events(s, dir))

  /** [[seqSupport]] over any `(user_id, ts, event_type)` events table —
    * fixture entry point. */
  def seqSupportOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ut = events
      .select($"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_sec"))
      .groupBy($"user_id", $"event_type")
      .agg(min($"ts_sec").as("first_sec"), max($"ts_sec").as("last_sec"))
    val a = ut.select($"user_id", $"event_type".as("type_a"),
      $"first_sec")
    val b = ut.select($"user_id", $"event_type".as("type_b"),
      $"last_sec")
    val nu = ut.agg(countDistinct($"user_id").as("n_total")) // 1 row
    a.join(b, "user_id")
      .filter($"first_sec" < $"last_sec")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(nu))
      .select($"type_a", $"type_b", $"n_users",
        expr("n_users * 10000L div n_total").as("support_bp"))
      .orderBy($"type_a", $"type_b")
  }

  /** THREE-STEP sequential-pattern support ⟨A → B → C⟩: users whose
    * history contains A, then B, then C in strict time order (any
    * distances). Pairs collapse to min/max per type ([[seqSupport]]);
    * triples genuinely cannot — ∃ tA<tB<tC needs a B occurrence strictly
    * INSIDE the (first A, last C) interval, and min/max of B can both lie
    * outside it while an inner occurrence exists is the wrong direction:
    * min/max of B can't witness interior membership. So the middle step
    * joins the B EVENTS against the per-user interval table:
    *
    *   - [[seqSupport]]'s (user, type) min/max aggregate gives ≤ T² open
    *     intervals (first_A, last_C) per user;
    *   - one equi-join ON USER fans each event onto ≤ T² intervals (a
    *     CONSTANT fan-out — T=5 here — never event×event), with the
    *     strict-interior test as the residual predicate;
    *   - a combinable exists-aggregate per (user, A, B, C) then the
    *     alphabet³-bounded support count.
    *
    * Second-truncated strictness, identical in the oracle — the same
    * declared semantic as the pair support. */
  def seqSupport3(s: SparkSession, dir: String): DataFrame =
    seqSupport3Of(Tables.events(s, dir))

  /** [[seqSupport3]] over any `(user_id, ts, event_type)` events table —
    * fixture entry point. */
  def seqSupport3Of(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ev = events.select($"user_id", $"event_type",
      unix_timestamp(date_trunc("second", $"ts")).as("ts_sec"))
    val ut = ev.groupBy($"user_id", $"event_type")
      .agg(min($"ts_sec").as("first_sec"), max($"ts_sec").as("last_sec"))
    val intervals = ut.select($"user_id", $"event_type".as("type_a"),
        $"first_sec")
      .join(ut.select($"user_id", $"event_type".as("type_c"),
        $"last_sec"), "user_id")
      .filter($"first_sec" < $"last_sec") // an interior point must fit
    val witnessed = ev.select($"user_id", $"event_type".as("type_b"),
        $"ts_sec")
      .join(intervals, "user_id")
      .filter($"ts_sec" > $"first_sec" && $"ts_sec" < $"last_sec")
      .select($"user_id", $"type_a", $"type_b", $"type_c")
      .distinct()
    witnessed
      .groupBy($"type_a", $"type_b", $"type_c")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"type_a", $"type_b", $"type_c")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_path_transitions" -> transitions _,
    "q_attribution" -> attribution _,
    "q_sessionize" -> sessionize _,
    "q_seq_support" -> seqSupport _,
    "q_seq_support3" -> seqSupport3 _,
  )

  val oracles: Map[String, String] = Map(
    // per-user (first_A, last_C) intervals, middle step witnessed by an
    // event strictly inside — the same interval-membership spelling
    "q_seq_support3" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    date_trunc('second', ts) AS t FROM events),
        |ut AS (SELECT user_id, event_type, min(t) AS f, max(t) AS l
        |  FROM ev GROUP BY 1, 2),
        |iv AS (SELECT a.user_id, a.event_type AS type_a,
        |    c.event_type AS type_c, a.f, c.l
        |  FROM ut a JOIN ut c ON c.user_id = a.user_id AND a.f < c.l),
        |w AS (SELECT DISTINCT e.user_id, i.type_a,
        |    e.event_type AS type_b, i.type_c
        |  FROM ev e JOIN iv i ON i.user_id = e.user_id
        |    AND e.t > i.f AND e.t < i.l)
        |SELECT type_a, type_b, type_c, CAST(count(*) AS BIGINT) AS n_users
        |FROM w GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // per-(user, type) first/last occurrence, subsequence = min(A) < max(B)
    "q_seq_support" ->
      """WITH ut AS (SELECT user_id, event_type,
        |    min(date_trunc('second', ts)) AS f,
        |    max(date_trunc('second', ts)) AS l
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT count(DISTINCT user_id) AS n_total FROM events),
        |sup AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_users
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.f < b.l
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(n_users * 10000 // n_total AS BIGINT) AS support_bp
        |FROM sup, tot ORDER BY type_a, type_b""".stripMargin,
    "q_path_transitions" ->
      s"""WITH s AS (SELECT user_id, event_id, event_type,
         |    date_trunc('second', ts) AS ts FROM events),
         |p AS (SELECT user_id, event_type AS dst,
         |    lag(event_type) OVER w AS src, ts - lag(ts) OVER w AS gap
         |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |m AS (SELECT src, dst, count(*) AS cnt FROM p
         |  WHERE src IS NOT NULL AND gap <= INTERVAL '$TransitionGapMin minutes'
         |  GROUP BY 1, 2)
         |SELECT src, dst, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(cnt * 10000 // sum(cnt) OVER (PARTITION BY src) AS BIGINT)
         |    AS prob_bp
         |FROM m ORDER BY src, dst""".stripMargin,
    // independent spelling: per-purchase row_number window instead of the
    // Spark side's combinable argmax
    "q_attribution" ->
      s"""WITH s AS (SELECT user_id, event_id, event_type,
         |    date_trunc('second', ts) AS ts FROM events),
         |pur AS (SELECT user_id, event_id AS pid, ts AS pts FROM s
         |  WHERE event_type = 'purchase'),
         |cand AS (SELECT p.pid, e.event_type, e.ts, e.event_id AS eid
         |  FROM pur p JOIN s e ON e.user_id = p.user_id
         |  WHERE e.event_type <> 'purchase' AND e.ts <= p.pts
         |    AND e.ts >= p.pts - INTERVAL '$AttributionWindowMin minutes'),
         |best AS (SELECT pid, event_type AS channel FROM (
         |  SELECT pid, event_type,
         |    row_number() OVER (PARTITION BY pid ORDER BY ts DESC, eid DESC) AS rn
         |  FROM cand) WHERE rn = 1)
         |SELECT COALESCE(b.channel, '(direct)') AS channel,
         |  count(*) AS cnt
         |FROM pur p LEFT JOIN best b ON b.pid = p.pid
         |GROUP BY 1 ORDER BY channel""".stripMargin,
    // same gap-flag + running-sum session numbering + rollup; epoch()
    // cast to BIGINT immediately (it returns DOUBLE)
    "q_sessionize" ->
      s"""WITH s AS (SELECT user_id, event_id, event_type,
         |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
         |  FROM events),
         |g AS (SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
         |      OR ts_sec - lag(ts_sec) OVER w > ${TransitionGapMin * 60L}
         |      THEN 1 ELSE 0 END AS new_sess
         |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
         |n AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM g)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  min(ts_sec) AS start_sec, max(ts_sec) AS end_sec,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_purchases,
         |  max(ts_sec) - min(ts_sec) AS duration_s
         |FROM n GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
  )
}
