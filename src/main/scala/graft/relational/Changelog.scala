package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** CDC changelog materialization — the batch replay of a change stream
  * into current table state (the Debezium/Flink-CDC "toChangelogStream →
  * materialize" contract, and the batch twin of the engine's streaming
  * [[graft.streaming.MaterializedView]] upserts): per key, apply
  * upserts/deletes in change order, LAST WRITER WINS, a trailing delete
  * tombstones the key out of the state entirely.
  *
  * Instance over the events stream: `error` = delete tombstone, every
  * other event upserts its cents value; change order is (event time,
  * event_id) — the deterministic total order a real CDC log carries as
  * (LSN). Output: the live rows only, each with its value, last-change
  * timestamp, and the number of log entries that ever touched the key (the
  * compaction-debt diagnostic).
  *
  * Shape at scale: ONE shuffle on the key, per-key ordering inside the
  * partition (the window sorts each key's log slice, never a global
  * order), then a map-side-combinable count rides the same partition. The
  * classic alternative — `max(struct(ts, id, op, val))` per key — is one
  * combinable aggregate with NO sort at all; the window spelling is kept
  * because it also yields `n_ops` in the same pass. */
object Changelog {

  def cdcState(s: SparkSession, dir: String): DataFrame =
    cdcStateOf(Tables.events(s, dir))

  /** [[cdcState]] over any `(user_id, ts, event_type, value)` events
    * table — fixture entry point. */
  def cdcStateOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val log = events.select(
      $"user_id",
      date_trunc("second", $"ts").as("ts_sec"),
      $"event_id",
      when($"event_type" === "error", lit("delete"))
        .otherwise(lit("upsert")).as("op"),
      floor($"value" * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec".desc, $"event_id".desc)
    val wn = Window.partitionBy($"user_id")
    log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(wn))
      .filter($"rn" === 1 && $"op" === "upsert")
      .select($"user_id", $"cents", $"ts_sec".as("last_ts"), $"n_ops")
      .orderBy($"user_id")
  }

  /** The open-interval sentinel for the current version's `valid_to` —
    * a NULL would sort/hash differently across engines, and the
    * conventional 9999-12-31 overflows int64-NANOSECOND timestamp
    * readers (pandas/Arrow cap at 2262-04-11), so the sentinel stays
    * inside the ns-safe range. */
  val Scd2Open = "2200-01-01 00:00:00"

  /** SCD TYPE-2 dimension build — the interval-history twin of
    * [[cdcState]]'s current-state materialization (Kimball's slowly
    * changing dimension type 2, the standard warehouse history table):
    * from the same change log, emit one row PER VERSION of each key with
    * `[valid_from, valid_to)` effectivity, a version number, and an
    * is_current flag — after CHANGE COMPRESSION (a log entry repeating
    * the previous value opens no new version; real CDC feeds are full of
    * no-op updates).
    *
    * Instance over the events stream: purchase events carry the cents
    * value, change order is the (ts_sec, event_id) LSN. Output: every
    * compressed version with its interval; the open version carries the
    * [[Scd2Open]] sentinel (not NULL — cross-engine sort/hash safety).
    *
    * Shape at scale: ONE shuffle on the key; the compression lag window,
    * the intervalizing lead window, and the version row_number all ride
    * the SAME (user, ts, id) partition sort — Catalyst plans one Exchange
    * + one Sort for all three (no per-window re-exchange), then a narrow
    * filter. History size is versions-bounded, never log-bounded. */
  def scd2(s: SparkSession, dir: String): DataFrame =
    scd2Of(Tables.events(s, dir))

  /** [[scd2]] over any `(user_id, ts, event_type, value, event_id)`
    * events table — fixture entry point. */
  def scd2Of(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val log = events
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("ts_sec"),
        $"event_id", floor($"value" * 100).cast("long").as("cents"))
    val ord = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val changed = log
      .withColumn("prev", lag($"cents", 1).over(ord))
      // first version, or the value actually changed (no-op updates
      // compress away)
      .filter($"prev".isNull || $"prev" =!= $"cents")
    val vord = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    changed
      .withColumn("version", row_number().over(vord))
      .withColumn("valid_from", $"ts_sec")
      .withColumn("valid_to",
        coalesce(lead($"ts_sec", 1).over(vord), lit(Scd2Open).cast("timestamp")))
      .withColumn("is_current",
        (lead($"ts_sec", 1).over(vord).isNull).cast("long"))
      .select($"user_id", $"version".cast("long").as("version"), $"cents",
        $"valid_from", $"valid_to", $"is_current")
      .orderBy($"user_id", $"version")
  }

  /** TEMPORAL (point-in-time) join — the query [[scd2]] exists to serve:
    * every non-purchase activity event joins the dimension VERSION that
    * was valid at its instant (`valid_from ≤ ts < valid_to`), the
    * as-of-correct enrichment that prevents the classic leakage bug of
    * joining history to TODAY's attribute value. Output is the compact
    * per-version activity rollup (events landing inside each version's
    * interval); activity before a user's first version drops (inner).
    *
    * Shape at scale: the dimension side is versions-sized (compressed,
    * ≪ log); the join is a USER-key equi-join with the interval predicate
    * as a residual filter — one shuffle each side, no range-join BNLJ,
    * no per-event sort. (The custom as-of SortMerge plan would also fit;
    * the equi+residual spelling is chosen because the version count per
    * user is small, making the residual cheap and the plan fully
    * Catalyst-native.) */
  def temporalJoin(s: SparkSession, dir: String): DataFrame =
    temporalJoinOf(Tables.events(s, dir))

  /** [[temporalJoin]] over any `(user_id, ts, event_type, value,
    * event_id)` events table — fixture entry point. */
  def temporalJoinOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dim = scd2Of(events)
      .select($"user_id", $"version", $"cents", $"valid_from", $"valid_to")
    val act = events
      .filter($"event_type" =!= "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("ats"))
    act.join(dim, Seq("user_id"))
      .filter($"ats" >= $"valid_from" && $"ats" < $"valid_to")
      .groupBy($"user_id", $"version", $"cents")
      .agg(count(lit(1)).as("n_activity"))
      .orderBy($"user_id", $"version")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_state" -> cdcState _,
    "q_scd2" -> scd2 _,
    "q_join_temporal" -> temporalJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q_cdc_state" ->
      """WITH log AS (SELECT user_id, date_trunc('second', ts) AS ts_sec,
        |    event_id,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_sec DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM log)
        |SELECT user_id, cents, ts_sec AS last_ts, CAST(n_ops AS BIGINT) AS n_ops
        |FROM r WHERE rn = 1 AND op = 'upsert'
        |ORDER BY user_id""".stripMargin,
    // same compression + intervalization in window functions; the open
    // version carries the engine-neutral sentinel, never NULL
    "q_scd2" ->
      s"""WITH log AS (SELECT user_id, date_trunc('second', ts) AS ts_sec,
         |    event_id, CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |ch AS (SELECT * FROM (SELECT *,
         |    lag(cents) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS prev
         |  FROM log) WHERE prev IS NULL OR prev <> cents),
         |v AS (SELECT user_id, cents, ts_sec AS valid_from,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS version,
         |    lead(ts_sec) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS nxt
         |  FROM ch)
         |SELECT user_id, CAST(version AS BIGINT) AS version, cents,
         |  valid_from, COALESCE(nxt, TIMESTAMP '$Scd2Open') AS valid_to,
         |  CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM v ORDER BY user_id, version""".stripMargin,
    // the scd2 CTEs replayed, then the interval join + rollup
    "q_join_temporal" ->
      s"""WITH log AS (SELECT user_id, date_trunc('second', ts) AS ts_sec,
         |    event_id, CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |ch AS (SELECT * FROM (SELECT *,
         |    lag(cents) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS prev
         |  FROM log) WHERE prev IS NULL OR prev <> cents),
         |v AS (SELECT user_id, cents, ts_sec AS valid_from,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS version,
         |    COALESCE(lead(ts_sec) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id), TIMESTAMP '$Scd2Open') AS valid_to
         |  FROM ch),
         |act AS (SELECT user_id, date_trunc('second', ts) AS ats
         |  FROM events WHERE event_type <> 'purchase')
         |SELECT a.user_id, CAST(v.version AS BIGINT) AS version, v.cents,
         |  CAST(count(*) AS BIGINT) AS n_activity
         |FROM act a JOIN v ON a.user_id = v.user_id
         |  AND a.ats >= v.valid_from AND a.ats < v.valid_to
         |GROUP BY a.user_id, v.version, v.cents
         |ORDER BY a.user_id, version""".stripMargin,
  )
}
