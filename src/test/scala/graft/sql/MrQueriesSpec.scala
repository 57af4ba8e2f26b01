package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Cep, EventPatterns}
import graft.pattern.{AfterMatchSkip, Pattern}

/** `q_mr_low_balance` (SQL MATCH_RECOGNIZE front-end) against the Pattern
  * DSL front-end configured with the SAME strict-internal semantics — the
  * two lowering paths (boolean DEFINE columns vs Scala lambdas) must agree
  * on the real sf0.001 events table.
  */
class MrQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_mr_low_balance equals the strict-internal DSL pattern at sf0.001") {
    import spark.implicits._
    import EventPatterns.EventRow
    val dir = "/root/testdata/sf0.001"

    val got = MrQueries.lowBalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getLong(3))).toSeq
    assert(got.nonEmpty, "q_mr_low_balance must produce rows at sf0.001 (driver smoke)")

    // DSL equivalent: strict contiguity INCLUDING loop internals (SQL row-
    // pattern semantics — every row between match start and end is consumed)
    val p = Pattern.begin[EventRow]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.event_type == "error")
      .next("B").where(e => e.event_type == "view" || e.event_type == "click")
      .oneOrMore.optional.consecutive
      .next("C").where(_.event_type == "purchase")
      .within(EventPatterns.WithinMs)
    val events = graft.sources.Tables.events(spark, dir)
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .as[EventRow]
    val want = Cep.matchPattern[Long, EventRow, (Long, Long, Long, Long)](
      events, _.user_id, _.ts_us / 1000L, p, Seq($"ts_us", $"event_id"))(
      (uid, m) => m.first("A").zip(m.first("C")).map { case (a, c) =>
        (uid, a.ts_us / 1000000L, c.ts_us / 1000000L, m("B").size.toLong)
      },
      (_, _) => None).collect().toSeq

    assert(got.sorted == want.sorted)
  }

  test("q_mr_funnel_alt alternation equals a single-OR-stage DSL pattern at sf0.001") {
    import spark.implicits._
    import EventPatterns.EventRow
    val dir = "/root/testdata/sf0.001"

    val got = MrQueries.funnelAlt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
        r.getTimestamp(2).getTime / 1000L, r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty, "q_mr_funnel_alt must produce rows at sf0.001 (driver smoke)")

    // DSL equivalent: ONE engagement stage with an OR predicate; per-member
    // counts recovered by filtering the bound rows — must equal the SQL
    // front-end's leftmost-preference attribution (disjoint predicates here)
    val p = Pattern.begin[EventRow]("S", AfterMatchSkip.SkipPastLastEvent)
      .where(_.event_type == "signup")
      .next("E").where(e => e.event_type == "view" || e.event_type == "click")
      .oneOrMore.consecutive
      .next("P").where(_.event_type == "purchase")
      .within(24L * 3600L * 1000L)
    val events = graft.sources.Tables.events(spark, dir)
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .as[EventRow]
    val want = Cep.matchPattern[Long, EventRow, (Long, Long, Long, Long, Long)](
      events, _.user_id, _.ts_us / 1000L, p, Seq($"ts_us", $"event_id"))(
      (uid, m) => m.first("S").zip(m.first("P")).map { case (s, pp) =>
        (uid, s.ts_us / 1000000L, pp.ts_us / 1000000L,
          m("E").count(_.event_type == "view").toLong,
          m("E").count(_.event_type == "click").toLong)
      },
      (_, _) => None).collect().toSeq

    assert(got.sorted == want.sorted)
  }
}
