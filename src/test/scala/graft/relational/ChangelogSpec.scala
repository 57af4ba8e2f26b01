package graft.relational

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CDC materialization semantics on a hand-written change log: last writer
  * wins, a trailing delete tombstones the key, a later upsert resurrects
  * it, and same-timestamp changes resolve by event_id (the LSN tiebreak).
  */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("last-writer-wins, tombstones, resurrection, LSN tiebreak") {
    import spark.implicits._
    val log = Seq(
      // user 1: two upserts → latest value survives
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.00),
      (1L, ts("2024-01-01 11:00:00"), 2L, "purchase", 2.00),
      // user 2: upsert then delete → absent
      (2L, ts("2024-01-01 10:00:00"), 3L, "view", 3.00),
      (2L, ts("2024-01-01 12:00:00"), 4L, "error", 0.00),
      // user 3: delete then later upsert → resurrected
      (3L, ts("2024-01-01 10:00:00"), 5L, "error", 0.00),
      (3L, ts("2024-01-01 13:00:00"), 6L, "signup", 4.50),
      // user 4: same timestamp, higher event_id wins
      (4L, ts("2024-01-01 10:00:00"), 7L, "click", 5.00),
      (4L, ts("2024-01-01 10:00:00"), 8L, "view", 6.00)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")

    val got = Changelog.cdcStateOf(log)
      .as[(Long, Long, Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 200L, ts("2024-01-01 11:00:00"), 2L),
      (3L, 450L, ts("2024-01-01 13:00:00"), 2L),
      (4L, 600L, ts("2024-01-01 10:00:00"), 2L)), got.toString)
  }

  test("scd2: change compression, intervals abut, open version sentinel") {
    import spark.implicits._
    val log = Seq(
      // user 1: 3 log entries but the middle repeats → 2 versions
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.00),
      (1L, ts("2024-01-01 11:00:00"), 2L, "purchase", 5.00), // no-op update
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase", 7.50),
      // user 2: single version, current from the start
      (2L, ts("2024-01-02 09:00:00"), 4L, "purchase", 1.00),
      // user 3: non-purchase rows never enter the dimension
      (3L, ts("2024-01-03 09:00:00"), 5L, "view", 9.99)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Changelog.scd2Of(log)
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().toSeq
    val open = ts(Changelog.Scd2Open)
    assert(got == Seq(
      (1L, 1L, 500L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 0L),
      (1L, 2L, 750L, ts("2024-01-01 12:00:00"), open, 1L),
      (2L, 1L, 100L, ts("2024-01-02 09:00:00"), open, 1L)), got.toString)
    // interval contract: versions tile the key's history — each valid_to
    // equals the next version's valid_from, exactly one current per key
    got.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4)
        case _ =>
      }
      assert(vs.count(_._6 == 1L) == 1)
      assert(vs.last._5 == open)
    }
  }

  test("temporal join enriches activity with the version valid AT ITS TIME") {
    import spark.implicits._
    val log = Seq(
      // user 1 versions: 500c from 10:00, 750c from 12:00 (open)
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.00),
      (1L, ts("2024-01-01 12:00:00"), 2L, "purchase", 7.50),
      // activity: before any version (drops), inside v1, AT the v2
      // boundary (belongs to v2 — intervals are [from, to)), after
      (1L, ts("2024-01-01 09:00:00"), 3L, "view", 0.0),
      (1L, ts("2024-01-01 11:00:00"), 4L, "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), 5L, "click", 0.0),
      (1L, ts("2024-01-01 13:00:00"), 6L, "view", 0.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Changelog.temporalJoinOf(log)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the leakage check: the 11:00 view joins the 500c version even
    // though the user's CURRENT value is 750c
    assert(got == Seq(
      (1L, 1L, 500L, 1L),
      (1L, 2L, 750L, 2L)), got.toString)
  }
}
