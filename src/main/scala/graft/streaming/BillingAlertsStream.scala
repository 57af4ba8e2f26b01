package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.events.BillingEvent
import graft.operators.{AlertOutput, BillingAlerts}

/** Streaming form of the reference's business query: identical pattern and
  * projections as the batch [[graft.operators.BillingAlerts]], executed with
  * watermarks + event-time timers. Watermark delay = the reference's 6-minute
  * `maxOutOfOrderness` (`FlinkCEPExample.scala:28`).
  *
  * Watermark-cadence contract (SURVEY.md §7.4): Flink advances watermarks
  * in-stream, Spark once per micro-batch — outputs are identical in CONTENT,
  * but appear in the first batch whose watermark passes the match/timeout
  * point (eventual equivalence; tests stage input across batches).
  */
object BillingAlertsStream {

  /** BillingEvent + derived event-time column carrying the watermark. */
  final case class TimedBilling(
      id: String, datetime: String, balanceBefore: Long, balanceAfter: Long,
      event_ts: Timestamp) {
    def toEvent: BillingEvent = BillingEvent(id, datetime, balanceBefore, balanceAfter)
  }

  def detect(
      events: Dataset[BillingEvent],
      watermarkDelay: String = "6 minutes"): Dataset[AlertOutput] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withColumn("event_ts", to_timestamp($"datetime", "yyyy-MM-dd HH:mm:ss"))
      .withWatermark("event_ts", watermarkDelay)
      .as[TimedBilling]
    CepStream.matchPattern[String, TimedBilling, AlertOutput](
      timed,
      keyFn = _.id,
      tsFn = _.event_ts.getTime,
      pattern = BillingAlerts.pattern.contramap[TimedBilling](_.toEvent),
      emitMatch = (id, m) =>
        m.first("A").zip(m.first("C")).map { case (a, c) =>
          AlertOutput("match", id, a.datetime, c.datetime)
        },
      emitTimeout = (id, t) =>
        t.first("A").map(a => AlertOutput("timeout", id, a.datetime, "")))
  }
}
