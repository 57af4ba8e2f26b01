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

  /** Funnel with `(V | K)` ALTERNATION: signup, then one-or-more view/click
    * engagement rows — each attributed to its own variable, counted
    * separately — then a purchase, strictly contiguous, within 1 day. */
  def funnelAlt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val out = MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES S.ts AS signup_ts0, P.ts AS purchase_ts0,
        |         COUNT(V.*) AS n_views, COUNT(K.*) AS n_clicks
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (S (V | K)+ P) WITHIN INTERVAL '24' HOUR
        |DEFINE
        |  S AS S.event_type = 'signup',
        |  V AS V.event_type = 'view',
        |  K AS K.event_type = 'click',
        |  P AS P.event_type = 'purchase'""".stripMargin)
    out.select($"user_id",
        date_trunc("second", $"signup_ts0").as("signup_ts"),
        date_trunc("second", $"purchase_ts0").as("purchase_ts"),
        $"n_views", $"n_clicks")
      .orderBy($"user_id", $"signup_ts", $"purchase_ts", $"n_views", $"n_clicks")
  }

  /** PERMUTE: a view, a click, and a conversion event (purchase or signup)
    * in ANY order, strictly contiguous, within 1 hour — SQL:2016 `PERMUTE`
    * lowered through the Glushkov graph compiler (alternation of all 6
    * orderings, lexicographic preference). CLASSIFIER reports which variable
    * closed the match. */
  def permute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val out = MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES V.ts AS view_ts0, K.ts AS click_ts0, C.ts AS conv_ts0,
        |         C.event_type AS conv_kind, CLASSIFIER() AS last_kind
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (PERMUTE(V, K, C)) WITHIN INTERVAL '1' HOUR
        |DEFINE
        |  V AS V.event_type = 'view',
        |  K AS K.event_type = 'click',
        |  C AS C.event_type = 'purchase' OR C.event_type = 'signup'""".stripMargin)
    out.select($"user_id",
        date_trunc("second", $"view_ts0").as("view_ts"),
        date_trunc("second", $"click_ts0").as("click_ts"),
        date_trunc("second", $"conv_ts0").as("conv_ts"),
        $"conv_kind", $"last_kind")
      .orderBy($"user_id", $"view_ts", $"click_ts", $"conv_ts", $"conv_kind", $"last_kind")
  }

  /** Quantified GROUP loop + SUBSET: one-or-more strictly alternating
    * view/click pairs closed by a purchase, within 1 day. `(V K)+` needs the
    * graph NFA (a sequence repeats, not a variable); `SUBSET ENG = (V, K)`
    * exposes the union of both engagement variables to MEASURES. */
  def cycles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val out = MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES COUNT(V.*) AS n_views, COUNT(K.*) AS n_clicks,
        |         COUNT(ENG.*) AS n_eng, FIRST(ENG.ts) AS start_ts0,
        |         P.ts AS purchase_ts0
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((V K)+ P) WITHIN INTERVAL '24' HOUR
        |SUBSET ENG = (V, K)
        |DEFINE
        |  V AS V.event_type = 'view',
        |  K AS K.event_type = 'click',
        |  P AS P.event_type = 'purchase'""".stripMargin)
    out.select($"user_id", $"n_views", $"n_clicks", $"n_eng",
        date_trunc("second", $"start_ts0").as("start_ts"),
        date_trunc("second", $"purchase_ts0").as("purchase_ts"))
      .orderBy($"user_id", $"start_ts", $"purchase_ts", $"n_eng")
  }

  /** Graph pattern + non-default skip: every engagement run ending in a
    * purchase, reported once PER ANCHOR ROW — `AFTER MATCH SKIP TO NEXT
    * ROW` resumes one row after each match's start, so matches overlap
    * (each suffix of a long engagement run is its own match). Requires the
    * graph lowering (alternation) AND the generalized sequential skip —
    * the r4 engine rejected this combination outright. */
  def skipOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val out = MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES COUNT(V.*) AS n_views, COUNT(K.*) AS n_clicks,
        |         P.ts AS purchase_ts0
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP TO NEXT ROW
        |PATTERN ((V | K)+ P) WITHIN INTERVAL '1' HOUR
        |DEFINE
        |  V AS V.event_type = 'view',
        |  K AS K.event_type = 'click',
        |  P AS P.event_type = 'purchase'""".stripMargin)
    out.select($"user_id", $"n_views", $"n_clicks",
        date_trunc("second", $"purchase_ts0").as("purchase_ts"))
      .orderBy($"user_id", $"purchase_ts", $"n_views", $"n_clicks")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mr_low_balance" -> lowBalance _,
    "q_mr_funnel_alt" -> funnelAlt _,
    "q_mr_permute" -> permute _,
    "q_mr_cycles" -> cycles _,
    "q_mr_skip_overlap" -> skipOverlap _,
  )
}
