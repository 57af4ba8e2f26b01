package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared engine queries that exercise the SQL MATCH_RECOGNIZE front-end
  * end-to-end over the driver testdata (the reference's
  * `FlinkSqlMatchRecognizeExample.scala:50-68` shape transplanted onto the
  * `events` table). Non-oracle — DuckDB has no MATCH_RECOGNIZE and the
  * sequential SKIP PAST LAST ROW semantics are not SQL-expressible — the
  * driver records a rows-only check; `MrQueriesSpec` pins the result against
  * the Pattern-DSL front-end (same NFA, independent lowering path).
  */
object MrQueries {

  /** The low-balance shape as SQL row-pattern semantics (STRICT loop
    * internals — unlike `q_cep_low_balance`, whose Flink-style loop skips
    * non-matching events between B repetitions): per user, an `error`
    * immediately followed by `view|click`* and a `purchase`, within 1h. */
  def lowBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val out = MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES A.ts AS alarm_ts0, C.ts AS topup_ts0, COUNT(B.*) AS n_b
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
        |DEFINE
        |  A AS A.event_type = 'error',
        |  B AS B.event_type = 'view' OR B.event_type = 'click',
        |  C AS C.event_type = 'purchase'""".stripMargin)
    out.select($"user_id",
        date_trunc("second", $"alarm_ts0").as("alarm_ts"),
        date_trunc("second", $"topup_ts0").as("topup_ts"),
        $"n_b")
      .orderBy($"user_id", $"alarm_ts", $"topup_ts", $"n_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mr_low_balance" -> lowBalance _,
  )
}
