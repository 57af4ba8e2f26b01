package graft.relational

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computable fixtures for the path-analytics pair: the Markov
  * transition matrix (session-gap bound, row-conditional basis points)
  * and last-touch attribution (latest touchpoint wins, LSN tiebreak,
  * direct fallback, lookback bound).
  */
class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("transitions: gap bound splits journeys; probs are row basis points") {
    import spark.implicits._
    val events = Seq(
      // user 1: view→click (5m), click→view (10m), view ⟂ click (2h gap)
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "click", ts("2024-01-01 10:05:00")),
      (1L, 3L, "view", ts("2024-01-01 10:15:00")),
      (1L, 4L, "click", ts("2024-01-01 12:15:00")),
      // user 2: view→purchase (1m)
      (2L, 5L, "view", ts("2024-01-01 09:00:00")),
      (2L, 6L, "purchase", ts("2024-01-01 09:01:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Paths.transitionsOf(events)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", "view", 1L, 10000L),
      ("view", "click", 1L, 5000L),
      ("view", "purchase", 1L, 5000L)), got.toString)
  }

  test("attribution: latest touch wins, id tiebreak, direct, lookback bound") {
    import spark.implicits._
    val events = Seq(
      // purchase credited to the LATER of two same-time touches (id 12)
      (1L, 11L, "view", ts("2024-01-01 10:30:00")),
      (1L, 12L, "click", ts("2024-01-01 10:30:00")),
      (1L, 13L, "purchase", ts("2024-01-01 10:45:00")),
      // touch outside the 60-minute lookback → (direct)
      (2L, 21L, "view", ts("2024-01-01 08:00:00")),
      (2L, 22L, "purchase", ts("2024-01-01 10:00:00")),
      // another user's touch never credits this purchase
      (3L, 31L, "signup", ts("2024-01-01 09:59:00")),
      (4L, 41L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Paths.attributionOf(events)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("(direct)", 2L), ("click", 1L)), got.toString)
  }

  test("sessionize: gap splits, numbering, composition, single-event session") {
    import spark.implicits._
    val events = Seq(
      // user 1: three events inside 30-min gaps, then a 2h jump → 2 sessions
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "click", ts("2024-01-01 10:20:00")),
      (1L, 3L, "purchase", ts("2024-01-01 10:40:00")),
      (1L, 4L, "view", ts("2024-01-01 12:40:00")),
      // user 2: exactly-30-min gap does NOT split (strict >)
      (2L, 5L, "view", ts("2024-01-01 09:00:00")),
      (2L, 6L, "purchase", ts("2024-01-01 09:30:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Paths.sessionizeOf(events)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    def sec(s: String) = ts(s).getTime / 1000L
    assert(got == Seq(
      (1L, 1L, sec("2024-01-01 10:00:00"), sec("2024-01-01 10:40:00"), 3L, 1L, 2400L),
      (1L, 2L, sec("2024-01-01 12:40:00"), sec("2024-01-01 12:40:00"), 1L, 0L, 0L),
      (2L, 1L, sec("2024-01-01 09:00:00"), sec("2024-01-01 09:30:00"), 2L, 1L, 1800L)),
      got.toString)
  }

  test("seq support: subsequence (not adjacency), strict order, self pairs") {
    import spark.implicits._
    val events = Seq(
      // user 1: view … click … view — view→click, click→view, view→view all
      // supported (subsequence ignores the intervening click)
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "click", ts("2024-01-01 11:00:00")),
      (1L, 3L, "view", ts("2024-01-01 12:00:00")),
      // user 2: click strictly before view — supports click→view only
      // (one view occurrence → no view→view; same-second purchase pair is
      // NOT strictly ordered at second granularity)
      (2L, 4L, "click", ts("2024-01-01 09:00:00")),
      (2L, 5L, "view", ts("2024-01-01 09:30:00")),
      (2L, 6L, "purchase", ts("2024-01-01 09:45:00")),
      (2L, 7L, "purchase", ts("2024-01-01 09:45:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Paths.seqSupportOf(events)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", "purchase", 1L, 5000L), // user 2 only
      ("click", "view", 2L, 10000L),    // both users
      ("view", "click", 1L, 5000L),     // user 1 only (user 2's view is after)
      ("view", "purchase", 1L, 5000L),  // user 2
      ("view", "view", 1L, 5000L)),     // user 1's repeat
      got.toString)
  }

  test("seq support3: interior witness required — min/max cannot fake it") {
    import spark.implicits._
    // user 1: B occurs ONLY outside (first A, last C) — B@05 before A@10,
    // B@25 after C@20 — so A→B→C is NOT supported even though min(B) <
    // max(C) and max(B) > min(A) (the exact case a min/max spelling gets
    // wrong); user 2: a genuine interior B
    val events = Seq(
      (1L, 1L, "error", ts("2024-01-01 10:00:00")),
      (1L, 2L, "view", ts("2024-01-01 09:00:00")),
      (1L, 3L, "view", ts("2024-01-01 13:00:00")),
      (1L, 4L, "purchase", ts("2024-01-01 12:00:00")),
      (2L, 5L, "error", ts("2024-01-01 10:00:00")),
      (2L, 6L, "view", ts("2024-01-01 11:00:00")),
      (2L, 7L, "purchase", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Paths.seqSupport3Of(events)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got(("error", "view", "purchase")) == 1L, got.toString) // user 2 only
    // user 1 still supports error→purchase→view (purchase@12 inside
    // (error@10, view@13)) — the interval machinery, not a fluke
    assert(got(("error", "purchase", "view")) == 1L, got.toString)
  }

  test("seq support3: randomized property == brute force triple scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(6961)
    val types = Vector("a", "b", "c")
    for (trial <- 1 to 4) {
      val events = (0 until 50).map { i =>
        (rnd.nextInt(5).toLong, i.toLong, types(rnd.nextInt(types.size)),
          ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
      }
      val byUser = events.groupBy(_._1)
      val exp = (for {
        ta <- types; tb <- types; tc <- types
        users = byUser.count { case (_, es) =>
          es.exists(x => x._3 == ta && es.exists(y => y._3 == tb &&
            x._4.getTime < y._4.getTime && es.exists(z => z._3 == tc &&
              y._4.getTime < z._4.getTime)))
        }
        if users > 0
      } yield (ta, tb, tc, users.toLong)).toSet
      val got = Paths.seqSupport3Of(
          events.toDF("user_id", "event_id", "event_type", "ts"))
        .as[(String, String, String, Long)].collect().toSet
      assert(got == exp, s"trial $trial: ${got -- exp} / ${exp -- got}")
    }
  }

  test("seq support: randomized property — min/max trick == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(4181)
    val types = Vector("view", "click", "purchase")
    for (trial <- 1 to 5) {
      val events = (0 until 60).map { i =>
        (rnd.nextInt(6).toLong, i.toLong, types(rnd.nextInt(types.size)),
          ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
      }
      // brute force: a user supports A→B iff some A event is STRICTLY
      // before some B event at second granularity
      val byUser = events.groupBy(_._1)
      val exp = (for {
        a <- types; b <- types
        users = byUser.count { case (_, es) =>
          es.exists(x => x._3 == a &&
            es.exists(y => y._3 == b && x._4.getTime < y._4.getTime))
        }
        if users > 0
      } yield (a, b, users.toLong)).toSet
      val got = Paths.seqSupportOf(
          events.toDF("user_id", "event_id", "event_type", "ts"))
        .select($"type_a", $"type_b", $"n_users")
        .as[(String, String, Long)].collect().toSet
      assert(got == exp, s"trial $trial: ${got -- exp} / ${exp -- got}")
    }
  }

  test("seq support: transitions adjacency is strictly narrower") {
    import spark.implicits._
    // A then B with a C between and a >30min gap: adjacency (transitions)
    // sees nothing ≤ gap, subsequence support still counts A→B
    val events = Seq(
      (1L, 1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, 2L, "error", ts("2024-01-01 11:00:00")),
      (1L, 3L, "purchase", ts("2024-01-01 13:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val sup = Paths.seqSupportOf(events)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(sup.map(r => (r._1, r._2)).toSet ==
      Set(("signup", "error"), ("signup", "purchase"), ("error", "purchase")))
    val adj = Paths.transitionsOf(events).collect()
    assert(adj.isEmpty) // every adjacent gap > 30 min
  }
}
