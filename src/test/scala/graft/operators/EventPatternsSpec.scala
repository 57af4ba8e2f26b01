package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The declared negation query (`q_cep_no_purchase`) against a brute-force
  * oracle that implements `A(error) notFollowedBy P(purchase)
  * followedBy C(click) within 1h, SKIP PAST LAST ROW` literally over the
  * real sf0.001 events table: sequential attempts per user, earliest start
  * wins, a purchase in the gap kills the attempt, deadline kills it, a
  * click completes it and scanning resumes after the click.
  */
class EventPatternsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import EventPatterns.EventRow

  private def brute(evs: Seq[EventRow]): Seq[(Long, Long)] = {
    val ev = evs.toIndexedSeq
    var out = List.empty[(Long, Long)] // (error ts_us, click ts_us)
    var i = 0
    while (i < ev.length) {
      if (ev(i).event_type != "error") i += 1
      else {
        val aMs = ev(i).ts_us / 1000L
        var j = i + 1
        var end = -1
        var dead = false
        while (j < ev.length && end < 0 && !dead) {
          if (ev(j).ts_us / 1000L >= aMs + EventPatterns.WithinMs) dead = true
          else ev(j).event_type match {
            case "purchase" => dead = true
            case "click" => end = j
            case _ => j += 1
          }
        }
        if (end >= 0) { out ::= (ev(i).ts_us, ev(end).ts_us); i = end + 1 }
        else i += 1
      }
    }
    out.reverse
  }

  test("q_cep_no_purchase matches the per-user brute-force oracle at sf0.001") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .as[EventRow].collect().toSeq
    val want = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      brute(evs.sortBy(e => (e.ts_us, e.event_id))).map { case (a, c) =>
        (uid, a / 1000000L, c / 1000000L) // second truncation, like the query
      }
    }.sorted
    val got = EventPatterns.noPurchase(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).getTime / 1000L, r.getTimestamp(2).getTime / 1000L))
      .toSeq.sorted
    assert(got.nonEmpty, "negation query must produce rows at sf0.001 (driver smoke)")
    assert(got == want)
  }

  /** Brute force for the `until` query: S=signup, B=anything* stopped at the
    * first purchase (the loop may neither take nor ignore it — B's predicate
    * is `true`, so no ignore path exists), P=that first purchase, within
    * 24h, SKIP PAST LAST ROW. Per attempt: the FIRST purchase after the
    * signup either completes the match (inside the horizon) or kills it —
    * a later purchase can never be P. */
  private def bruteUntil(evs: Seq[EventRow]): Seq[(Long, Long, Int)] = {
    val W = 24L * 3600L * 1000L
    val ev = evs.toIndexedSeq
    var out = List.empty[(Long, Long, Int)] // (signup us, purchase us, n_between)
    var i = 0
    while (i < ev.length) {
      if (ev(i).event_type != "signup") i += 1
      else {
        val sMs = ev(i).ts_us / 1000L
        var j = i + 1
        while (j < ev.length && ev(j).event_type != "purchase") j += 1
        if (j < ev.length && ev(j).ts_us / 1000L < sMs + W) {
          out ::= ((ev(i).ts_us, ev(j).ts_us, j - i - 1))
          i = j + 1
        } else i += 1
      }
    }
    out.reverse
  }

  test("q_cep_until matches the per-user brute-force oracle at sf0.001") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .as[EventRow].collect().toSeq
    val want = events.groupBy(_.user_id).toSeq.flatMap { case (uid, evs) =>
      bruteUntil(evs.sortBy(e => (e.ts_us, e.event_id))).map { case (s, p, nb) =>
        (uid, s / 1000000L, p / 1000000L, nb) // second truncation, like the query
      }
    }.sorted
    val got = EventPatterns.untilStreak(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getInt(3)))
      .toSeq.sorted
    assert(got.nonEmpty, "until query must produce rows at sf0.001 (driver smoke)")
    assert(got == want)
    assert(got.exists(_._4 > 0),
      "fixture must exercise non-empty B loops or the until path is untested")
  }
}
