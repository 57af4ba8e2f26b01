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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_count" -> countWindow _,
    "q_window_tumbling" -> tumbling _,
    "q_window_sliding" -> sliding _,
    "q_window_session" -> session _,
    "q_dedup" -> dedup _,
  )

  val oracles: Map[String, String] = Map(
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
