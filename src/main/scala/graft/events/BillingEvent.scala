package graft.events

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Input event type of the reference's business query
  * (`/root/reference/src/main/scala/kosmag/events/BillingEvent.scala:3-8`):
  * one billing record per account, with the balance before/after.
  * `datetime` is carried as a String (`yyyy-MM-dd HH:mm:ss`); event time is
  * derived as UTC epoch millis at second granularity, matching the reference's
  * watermark assigner (`FlinkCEPExample.scala:32-37`).
  */
final case class BillingEvent(
    id: String,
    datetime: String,
    balanceBefore: Long,
    balanceAfter: Long) {
  def eventTimeMillis: Long = BillingEvent.epochMillis(datetime)
}

object BillingEvent {
  val DateFormat = "yyyy-MM-dd HH:mm:ss"
  private val fmt = DateTimeFormatter.ofPattern(DateFormat)

  def epochMillis(datetime: String): Long =
    LocalDateTime.parse(datetime, fmt).toEpochSecond(ZoneOffset.UTC) * 1000L

  /** Positional CSV parse, no header (reference `BillingEvent.scala:11-19`). */
  def parse(line: String): BillingEvent = {
    val f = line.split(",")
    BillingEvent(f(0), f(1), f(2).trim.toLong, f(3).trim.toLong)
  }
}

/** Output event type (`events/AlertReactionEvent.scala:3-5`);
  * `topupDatetime == ""` marks a timed-out (absence) output.
  */
final case class AlertReactionEvent(
    id: String,
    alarmTriggerDatetime: String,
    topupDatetime: String)
