package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pattern.{AfterMatchSkip, Pattern}

/** The reference's CEP query transplanted onto the driver testdata `events`
  * table (FIXTURES.md §B.1): per `user_id`, ordered by `ts`,
  * `PATTERN (A B* C) WITHIN 1h, AFTER MATCH SKIP PAST LAST ROW` with
  * A=`error`, B=`view|click`, C=`purchase` — the same shape as
  * `FlinkCEPExample.scala:58-74` (strict stage contiguity, relaxed loop
  * internals), plus the absence/timeout variant
  * (`FlinkCEPAbsenceOfEventExample.scala:78-104`).
  */
object EventPatterns {

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  final case class CepOut(kind: String, user_id: Long, alarm_ts: Timestamp, topup_ts: Timestamp)

  val WithinMs: Long = 3600L * 1000L

  def pattern: Pattern[EventRow] =
    Pattern.begin[EventRow]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.event_type == "error")
      .next("B").where(e => e.event_type == "view" || e.event_type == "click")
      .oneOrMore.optional
      .next("C").where(_.event_type == "purchase")
      .within(WithinMs)

  /** Second-truncation for deterministic cross-engine comparison (events.ts is
    * ns in parquet, µs in Spark — FIXTURES.md §B.1 timestamp caveat). */
  private def truncSecond(ts: Timestamp): Timestamp =
    new Timestamp(math.floorDiv(ts.getTime, 1000L) * 1000L)

  /** Tagged match/timeout detection (kind = "match" | "timeout"). */
  def detect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .as[EventRow]
    Cep.matchPattern[Long, EventRow, CepOut](
      events,
      keyFn = _.user_id,
      tsFn = _.ts.getTime,
      pattern = pattern,
      sortCols = Seq($"ts", $"event_id"))(
      emitMatch = (uid, m) =>
        m.first("A").zip(m.first("C")).map { case (a, c) =>
          CepOut("match", uid, truncSecond(a.ts), truncSecond(c.ts))
        },
      emitTimeout = (uid, t) =>
        t.first("A").map(a => CepOut("timeout", uid, truncSecond(a.ts), null)))
      .toDF()
  }

  /** Completed matches: one row per match, `(user_id, alarm_ts, topup_ts)`. */
  def lowBalance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    detect(spark, sfDir)
      .filter($"kind" === "match")
      .select($"user_id", $"alarm_ts", $"topup_ts")
      .orderBy($"user_id", $"alarm_ts", $"topup_ts")
  }

  /** Conversion-funnel pattern with RELAXED contiguity (`followedBy`) — the
    * DSL configuration the strict billing shape doesn't exercise: signup,
    * then one-or-more engagement events, then a purchase, within one day.
    */
  def funnelPattern: Pattern[EventRow] =
    Pattern.begin[EventRow]("S", AfterMatchSkip.SkipPastLastEvent)
      .where(_.event_type == "signup")
      .followedBy("E").where(e => e.event_type == "view" || e.event_type == "click")
      .oneOrMore
      .followedBy("P").where(_.event_type == "purchase")
      .within(24L * 3600L * 1000L)

  /** Funnel matches: `(user_id, signup_ts, purchase_ts, n_engagement)`. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .as[EventRow]
    Cep.matchPattern[Long, EventRow, (Long, Timestamp, Timestamp, Int)](
      events,
      keyFn = _.user_id,
      tsFn = _.ts.getTime,
      pattern = funnelPattern,
      sortCols = Seq($"ts", $"event_id"))(
      emitMatch = (uid, m) =>
        m.first("S").zip(m.first("P")).map { case (s, p) =>
          (uid, truncSecond(s.ts), truncSecond(p.ts), m("E").size)
        },
      emitTimeout = (_, _) => None)
      .toDF("user_id", "signup_ts", "purchase_ts", "n_engagement")
      .orderBy($"user_id", $"signup_ts")
  }

  /** Timed-out partial matches (absence of top-up): `(user_id, alarm_ts)`. */
  def absence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    detect(spark, sfDir)
      .filter($"kind" === "timeout")
      .select($"user_id", $"alarm_ts")
      .distinct()
      .orderBy($"user_id", $"alarm_ts")
  }
}
