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

  /** Per-user event sequences (sorted by ts, event_id) for the brute-force
    * scans below. Times in ms. */
  private def eventsByUser(dir: String): Map[Long, Vector[(Long, String)]] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"event_id", $"event_type")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(r => (r.getLong(1) / 1000L, r.getString(3))).toVector)
      .toMap
  }

  test("q_mr_permute equals a literal sequential triple scan at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = MrQueries.permute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, r.getString(4), r.getString(5))).toSeq
    assert(got.nonEmpty, "q_mr_permute must produce rows at sf0.001 (driver smoke)")

    // brute force straight from the PERMUTE semantics: three adjacent rows,
    // one view + one click + one conversion, any order, within 1h, earliest
    // start wins, SKIP PAST LAST ROW
    def varOf(kind: String): Option[String] = kind match {
      case "view" => Some("V")
      case "click" => Some("K")
      case "purchase" | "signup" => Some("C")
      case _ => None
    }
    val Within = 3600L * 1000L
    val want = eventsByUser(dir).toSeq.flatMap { case (uid, ev) =>
      val out = Seq.newBuilder[(Long, Long, Long, Long, String, String)]
      var i = 0
      while (i + 2 < ev.length) {
        val vars = (i to i + 2).map(j => varOf(ev(j)._2))
        if (vars.forall(_.isDefined) && vars.flatten.toSet.size == 3 &&
            ev(i + 2)._1 < ev(i)._1 + Within) {
          val at = (v: String) => (i to i + 2).find(j => varOf(ev(j)._2).contains(v)).get
          val cRow = ev(at("C"))
          out += ((uid, (ev(at("V"))._1 / 1000L) * 1000L, (ev(at("K"))._1 / 1000L) * 1000L,
            (cRow._1 / 1000L) * 1000L, cRow._2, vars.last.get))
          i += 3
        } else i += 1
      }
      out.result()
    }
    assert(got.sorted == want.sorted)
  }

  test("q_mr_skip_overlap equals a literal every-anchor scan at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = MrQueries.skipOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime)).toSeq
    assert(got.nonEmpty, "q_mr_skip_overlap must produce rows at sf0.001 (driver smoke)")

    // brute force: SKIP TO NEXT ROW visits EVERY row as an anchor. At each
    // anchor: greedy maximal contiguous view/click run, backed off to the
    // longest run whose next row is a purchase within 1h — the anchored-
    // preferred ((V | K)+ P) match. Then advance one row (overlap legal).
    val Within = 3600L * 1000L
    val want = eventsByUser(dir).toSeq.flatMap { case (uid, ev) =>
      ev.indices.flatMap { i =>
        var m = 0
        while (i + m < ev.length &&
            (ev(i + m)._2 == "view" || ev(i + m)._2 == "click")) m += 1
        (m to 1 by -1).collectFirst {
          case r if i + r < ev.length && ev(i + r)._2 == "purchase" &&
              ev(i + r)._1 < ev(i)._1 + Within =>
            val run = ev.slice(i, i + r)
            (uid, run.count(_._2 == "view").toLong,
              run.count(_._2 == "click").toLong,
              (ev(i + r)._1 / 1000L) * 1000L)
        }
      }
    }
    assert(got.sorted == want.sorted)
    // and it must be a strict SUPERSET of the PAST LAST ROW variant: the
    // old engine could only express the non-overlapping scan
    val pastLast = MatchRecognize(
      graft.sources.Tables.events(spark, dir)
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type")),
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES COUNT(V.*) AS n_views, COUNT(K.*) AS n_clicks,
        |         P.ts AS purchase_ts0
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN ((V | K)+ P) WITHIN INTERVAL '1' HOUR
        |DEFINE
        |  V AS V.event_type = 'view',
        |  K AS K.event_type = 'click',
        |  P AS P.event_type = 'purchase'""".stripMargin).count()
    assert(got.size > pastLast, s"overlap expected: toNext=${got.size} pastLast=$pastLast")
  }

  test("q_mr_cycles equals a literal greedy pair scan at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = MrQueries.cycles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getTimestamp(4).getTime, r.getTimestamp(5).getTime)).toSeq
    assert(got.nonEmpty, "q_mr_cycles must produce rows at sf0.001 (driver smoke)")

    // brute force: maximal run of strictly alternating (view click) pairs,
    // greedy backoff to the largest pair count whose next row is a purchase
    // within 24h; SKIP PAST LAST ROW
    val Within = 24L * 3600L * 1000L
    val want = eventsByUser(dir).toSeq.flatMap { case (uid, ev) =>
      val out = Seq.newBuilder[(Long, Long, Long, Long, Long, Long)]
      var i = 0
      while (i < ev.length) {
        var m = 0
        while (i + 2 * m + 1 < ev.length &&
            ev(i + 2 * m)._2 == "view" && ev(i + 2 * m + 1)._2 == "click") m += 1
        val k = (m to 1 by -1).find(k0 =>
          i + 2 * k0 < ev.length && ev(i + 2 * k0)._2 == "purchase" &&
            ev(i + 2 * k0)._1 < ev(i)._1 + Within)
        k match {
          case Some(k0) =>
            out += ((uid, k0.toLong, k0.toLong, 2L * k0,
              (ev(i)._1 / 1000L) * 1000L, (ev(i + 2 * k0)._1 / 1000L) * 1000L))
            i += 2 * k0 + 1
          case None => i += 1
        }
      }
      out.result()
    }
    assert(got.sorted == want.sorted)
  }
}
