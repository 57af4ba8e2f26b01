package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.events.{AlertReactionEvent, BillingEvent}
import graft.pattern.{AfterMatchSkip, Pattern}

/** Tagged match/timeout output ADT — the engine's replacement for Flink side
  * outputs (`FlinkCEPAbsenceOfEventExample.scala:77,106`): one dataset, a
  * `kind` discriminator, split downstream by `filter`.
  */
final case class AlertOutput(
    kind: String, // "match" | "timeout"
    id: String,
    alarmTriggerDatetime: String,
    topupDatetime: String) {
  def toAlert: AlertReactionEvent = AlertReactionEvent(id, alarmTriggerDatetime, topupDatetime)
}

/** The reference's one business query — "low-balance alarm followed by top-up
  * within 1 hour", `PATTERN (A B* C) WITHIN 1h, AFTER MATCH SKIP PAST LAST
  * ROW`, keyed by account id — plus its absence (timeout) variant.
  * Conditions per `FlinkCEPExample.scala:58-74` /
  * `FlinkSqlMatchRecognizeExample.scala:50-68`.
  */
object BillingAlerts {

  val WithinMs: Long = 3600L * 1000L // within(Time.hours(1)), FlinkCEPExample.scala:74

  /** `A next B*(relaxed-internal) next C within 1h, skipPastLastEvent`. */
  def pattern: Pattern[BillingEvent] =
    Pattern.begin[BillingEvent]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(e => e.balanceBefore >= 10 && e.balanceAfter < 10)
      .next("B").where(e => e.balanceBefore >= e.balanceAfter).oneOrMore.optional
      .next("C").where(e => e.balanceBefore < e.balanceAfter)
      .within(WithinMs)

  /** Batch detection over a typed billing stream: matches tagged "match"
    * (`(id, A.datetime, C.datetime)`, `FlinkCEPExample.scala:84-90`) and
    * timed-out partials tagged "timeout" (`(id, A.datetime, "")`,
    * `FlinkCEPAbsenceOfEventExample.scala:93-103`).
    */
  def detect(ds: Dataset[BillingEvent]): Dataset[AlertOutput] = {
    val spark = ds.sparkSession
    import spark.implicits._
    Cep.matchPattern[String, BillingEvent, AlertOutput](
      ds,
      keyFn = _.id,
      tsFn = _.eventTimeMillis,
      pattern = pattern,
      // shuffle-sort each key's events by event time; datetime string order ==
      // chronological order for the fixed `yyyy-MM-dd HH:mm:ss` format
      sortCols = Seq($"datetime"))(
      emitMatch = (id, m) =>
        m.first("A").zip(m.first("C")).map { case (a, c) =>
          AlertOutput("match", id, a.datetime, c.datetime)
        },
      emitTimeout = (id, t) =>
        t.first("A").map(a => AlertOutput("timeout", id, a.datetime, "")))
  }

  /** Read the reference's CSV fixture format into a typed dataset. */
  def readCsv(spark: SparkSession, path: String): Dataset[BillingEvent] = {
    import spark.implicits._
    spark.read.textFile(path).map(BillingEvent.parse)
  }
}
