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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_state" -> cdcState _,
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
  )
}
