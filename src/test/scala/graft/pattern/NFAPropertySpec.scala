package graft.pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the NFA against an independent brute-force oracle that
  * implements the `A B* C within, SKIP PAST LAST ROW` semantics literally
  * (sequential earliest-match attempt scan, SURVEY.md §2.2), plus structural
  * invariants (snapshot/restore at arbitrary cut points, sort-invariance).
  * Uses scalacheck Gen directly (deterministic seed walk) — no scalatestplus.
  */
class NFAPropertySpec extends AnyFunSuite {

  case class Ev(ts: Long, kind: Char) // 'a' alarm, 'b' decline, 'c' topup, 'x' other

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 40)
    kinds <- Gen.listOfN(n, Gen.frequency(3 -> 'a', 4 -> 'b', 3 -> 'c', 2 -> 'x'))
    gaps <- Gen.listOfN(n, Gen.choose(1L, 40L))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    ts.zip(kinds).map { case (t, k) => Ev(t, k) }
  }

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val Within = 60L

  private def pattern(within: Option[Long]): Pattern[Ev] = {
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 'a')
      .next("B").where(_.kind == 'b').oneOrMore.optional
      .next("C").where(_.kind == 'c')
    within.fold(p)(p.within)
  }

  /** Brute force, straight from the spec. Attempts are independent and
    * resolved sequentially (earliest start wins; SKIP PAST LAST ROW then
    * resumes after the match). Strict contiguity into B/C from A; once at
    * least one B is taken, the loop's internal contiguity is RELAXED (Flink
    * oneOrMore default): non-matching events are skipped. An event at or
    * after A.ts + within retires the attempt as a timeout first; end of
    * input retires open attempts.
    */
  private def brute(events: List[Ev], within: Option[Long]): (List[(Long, Long)], List[Long]) = {
    val ev = events.toIndexedSeq
    var matches = List.empty[(Long, Long)]
    var timeouts = List.empty[Long]
    var i = 0
    while (i < ev.length) {
      if (ev(i).kind != 'a') { i += 1 }
      else {
        val aTs = ev(i).ts
        val deadline = within.map(aTs + _)
        var j = i + 1
        var inLoop = false
        var result: Option[Either[Long, Int]] = None // Left timeout/-1 kill; Right matchEnd
        while (j < ev.length && result.isEmpty) {
          if (deadline.exists(ev(j).ts >= _)) result = Some(Left(aTs))
          else ev(j).kind match {
            case 'c' => result = Some(Right(j))
            case 'b' => inLoop = true; j += 1
            case _ => if (inLoop) j += 1 else result = Some(Left(-1L))
          }
        }
        if (result.isEmpty) result = Some(Left(if (within.isDefined) aTs else -1L))
        result.get match {
          case Right(end) =>
            matches ::= (aTs, ev(end).ts)
            i = end + 1
          case Left(t) =>
            if (t >= 0) timeouts ::= t
            i += 1
        }
      }
    }
    (matches.reverse, timeouts.reverse)
  }

  test("NFA matches the brute-force oracle on random sequences (with within)") {
    forSamples(genEvents, 400) { events =>
      val (bm, bt) = brute(events, Some(Within))
      val (nm, nt) = NFA.run(events.iterator, (_: Ev).ts, pattern(Some(Within)))
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bm, s"matches differ for $events")
      assert(nt.map(_.startTs).sorted.toList == bt.sorted, s"timeouts differ for $events")
    }
  }

  test("NFA matches the brute-force oracle without within") {
    forSamples(genEvents, 300) { events =>
      val (bm, _) = brute(events, None)
      val (nm, nt) = NFA.run(events.iterator, (_: Ev).ts, pattern(None))
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bm, s"matches differ for $events")
    }
  }

  /** Brute force for the RELAXED funnel shape `A followedBy B+ followedBy C
    * within, skipPastLast`: first unresolved 'a' starts an attempt; 'b's
    * collect (relaxed first-match — matching events must be taken);
    * the first 'c' with >=1 collected b completes; any non-matching event is
    * ignored; at or past the deadline the attempt dies; SKIP PAST LAST ROW
    * resumes after a match's last row. Attempts are independent, earliest
    * start wins.
    */
  private def bruteRelaxed(events: List[Ev]): List[(Long, Long)] = {
    val ev = events.toIndexedSeq
    var matches = List.empty[(Long, Long)]
    var i = 0
    while (i < ev.length) {
      if (ev(i).kind != 'a') { i += 1 }
      else {
        val aTs = ev(i).ts
        var j = i + 1
        var nB = 0
        var end = -1
        var dead = false
        while (j < ev.length && end < 0 && !dead) {
          if (ev(j).ts >= aTs + Within) dead = true
          else ev(j).kind match {
            case 'b' => nB += 1; j += 1
            case 'c' if nB >= 1 => end = j
            case _ => j += 1
          }
        }
        if (end >= 0) { matches ::= (aTs, ev(end).ts); i = end + 1 }
        else i += 1
      }
    }
    matches.reverse
  }

  test("NFA matches the relaxed-shape brute-force oracle (funnel pattern)") {
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 'a')
      .followedBy("B").where(_.kind == 'b').oneOrMore
      .followedBy("C").where(_.kind == 'c')
      .within(Within)
    forSamples(genEvents, 300) { events =>
      val (nm, _) = NFA.run(events.iterator, (_: Ev).ts, p)
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bruteRelaxed(events),
        s"relaxed matches differ for $events")
    }
  }

  /** Brute force for the UNTIL shape `A followedBy B+ until(u) followedBy C,
    * skipPastLast, no within` with u NOT matching B's predicate: before the
    * first b, a u is an ordinary ignorable event (the stop condition
    * governs loop consumption, not the gap before it); once inside the
    * loop, the first u FREEZES collection (the partial may neither take nor
    * ignore within the loop — it proceeds and waits at C); the first c with
    * ≥1 collected b completes with the b-count frozen at that point; b's
    * and u's after the freeze are ignored at C. Earliest start wins, resume
    * after the match. */
  private def bruteUntil(events: List[Ev]): List[(Long, Long, Int)] = {
    val ev = events.toIndexedSeq
    var out = List.empty[(Long, Long, Int)]
    var i = 0
    while (i < ev.length) {
      if (ev(i).kind != 'a') { i += 1 }
      else {
        var j = i + 1
        var nB = 0
        var frozen = false
        var end = -1
        while (j < ev.length && end < 0) {
          ev(j).kind match {
            case 'c' if nB >= 1 => end = j
            case 'b' if !frozen => nB += 1
            case 'u' if nB >= 1 => frozen = true
            case _ => ()
          }
          if (end < 0) j += 1
        }
        if (end >= 0) { out ::= ((ev(i).ts, ev(end).ts, nB)); i = end + 1 }
        else i += 1
      }
    }
    out.reverse
  }

  private val genEventsU: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 40)
    kinds <- Gen.listOfN(n, Gen.frequency(
      3 -> 'a', 4 -> 'b', 3 -> 'c', 2 -> 'u', 2 -> 'x'))
    gaps <- Gen.listOfN(n, Gen.choose(1L, 40L))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    ts.zip(kinds).map { case (t, k) => Ev(t, k) }
  }

  test("until (loop stop) matches the brute-force oracle on random " +
    "sequences — relaxed contiguity, freeze-then-proceed semantics") {
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 'a')
      .followedBy("B").where(_.kind == 'b').oneOrMore.until(_.kind == 'u')
      .followedBy("C").where(_.kind == 'c')
    forSamples(genEventsU, 400) { events =>
      val (nm, _) = NFA.run(events.iterator, (_: Ev).ts, p)
      val got = nm.map(m => (m.startTs, m.endTs, m("B").size)).toList
      assert(got == bruteUntil(events),
        s"until matches differ for $events: got $got, want ${bruteUntil(events)}")
    }
  }

  test("incremental runner with snapshot/restore at arbitrary cut == single-shot run") {
    forSamples(genEvents.flatMap(es => Gen.choose(0, 40).map(c => (es, c))), 300) {
      case (events, cutRaw) =>
        val cut = if (events.isEmpty) 0 else cutRaw % (events.length + 1)
        val single = NFA.run(events.iterator, (_: Ev).ts, pattern(Some(Within)))

        val r1 = new NfaRunner[Ev](pattern(Some(Within)), _.ts)
        val out1 = events.take(cut).flatMap { e =>
          val (m, t) = r1.onEvent(e); m.map(Left(_)) ++ t.map(Right(_))
        }
        val r2 = new NfaRunner[Ev](pattern(Some(Within)), _.ts)
        r2.restore(r1.snapshot())
        val out2 = events.drop(cut).flatMap { e =>
          val (m, t) = r2.onEvent(e); m.map(Left(_)) ++ t.map(Right(_))
        } ++ { val (fm, ft) = r2.flush(); fm.map(Left(_)) ++ ft.map(Right(_)) }

        val matches = (out1 ++ out2).collect { case Left(m) => (m.startTs, m.endTs) }
        val timeouts = (out1 ++ out2).collect { case Right(t) => t.startTs }.sorted
        assert(matches == single._1.map(m => (m.startTs, m.endTs)).toList)
        assert(timeouts == single._2.map(_.startTs).sorted.toList)
    }
  }

  test("sorting a shuffled buffer reproduces the in-order result") {
    forSamples(genEvents.flatMap(es => Gen.long.map(s => (es, s))), 200) {
      case (events, seedL) =>
        val sorted = new scala.util.Random(seedL).shuffle(events).sortBy(_.ts)
        val a = NFA.run(events.iterator, (_: Ev).ts, pattern(Some(Within)))
        val b = NFA.run(sorted.iterator, (_: Ev).ts, pattern(Some(Within)))
        assert(a == b)
    }
  }

  /** Maximal runs of consecutive 'b' events — the SQL greedy trailing-loop
    * contract (`PATTERN (D+)`): a match emits only when it can no longer
    * extend, not at the first completion. */
  private def bruteMaxRuns(events: List[Ev]): List[(Long, Long)] = {
    val ev = events.toIndexedSeq
    var out = List.empty[(Long, Long)]
    var i = 0
    while (i < ev.length) {
      if (ev(i).kind != 'b') i += 1
      else {
        var j = i
        while (j + 1 < ev.length && ev(j + 1).kind == 'b') j += 1
        out ::= (ev(i).ts, ev(j).ts)
        i = j + 1
      }
    }
    out.reverse
  }

  private val trailingLoop = Pattern.begin[Ev]("D", AfterMatchSkip.SkipPastLastEvent)
    .where(_.kind == 'b').oneOrMore.consecutive

  test("trailing greedy loop emits maximal runs (champion deferral)") {
    forSamples(genEvents, 300) { events =>
      val (nm, _) = NFA.run(events.iterator, (_: Ev).ts, trailingLoop)
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bruteMaxRuns(events),
        s"maximal runs differ for $events")
    }
  }

  test("trailing greedy loop + within: maximal runs truncate at the horizon") {
    // brute: maximal consecutive-'b' runs, additionally cut when the next
    // 'b' would land at or past start + Within; matching resumes there
    def bruteWithin(events: List[Ev]): List[(Long, Long)] = {
      val ev = events.toIndexedSeq
      var out = List.empty[(Long, Long)]
      var i = 0
      while (i < ev.length) {
        if (ev(i).kind != 'b') i += 1
        else {
          val start = ev(i).ts
          var j = i
          while (j + 1 < ev.length && ev(j + 1).kind == 'b' &&
            ev(j + 1).ts < start + Within) j += 1
          out ::= (start, ev(j).ts)
          i = j + 1
        }
      }
      out.reverse
    }
    val p = trailingLoop.within(Within)
    forSamples(genEvents, 300) { events =>
      val (nm, _) = NFA.run(events.iterator, (_: Ev).ts, p)
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bruteWithin(events),
        s"within-truncated runs differ for $events")
    }
  }

  test("trailing-loop champion survives snapshot/restore at any cut") {
    forSamples(genEvents.flatMap(es => Gen.choose(0, math.max(es.length, 1)).map((es, _))), 200) {
      case (events, cut) =>
        val single = NFA.run(events.iterator, (_: Ev).ts, trailingLoop)
        val r1 = new NfaRunner[Ev](trailingLoop, _.ts)
        val out1 = events.take(cut).map(r1.onEvent)
        val r2 = new NfaRunner[Ev](trailingLoop, _.ts)
        r2.restore(r1.snapshot())
        val out2 = events.drop(cut).map(r2.onEvent)
        val (fm, _) = r2.flush()
        val matches = ((out1 ++ out2).flatMap(_._1) ++ fm).map(m => (m.startTs, m.endTs))
        assert(matches == single._1.map(m => (m.startTs, m.endTs)).toList)
    }
  }

  /** Brute force for the NEGATED gap shape `A notFollowedBy(X: 'x')
    * followedBy C, skipPastLast, no within`: attempt from each 'a'; scanning
    * forward, an 'x' kills the attempt (restart at the next event after the
    * 'a'), a 'c' completes it (resume after), anything else is ignored.
    */
  private def bruteNegated(events: List[Ev]): List[(Long, Long)] = {
    val ev = events.toIndexedSeq
    var matches = List.empty[(Long, Long)]
    var i = 0
    while (i < ev.length) {
      if (ev(i).kind != 'a') { i += 1 }
      else {
        val aTs = ev(i).ts
        var j = i + 1
        var end = -1
        var dead = false
        while (j < ev.length && end < 0 && !dead) {
          ev(j).kind match {
            case 'x' => dead = true
            case 'c' => end = j
            case _ => j += 1
          }
        }
        if (end >= 0) { matches ::= (aTs, ev(end).ts); i = end + 1 }
        else i += 1
      }
    }
    matches.reverse
  }

  test("negated pattern matches the brute-force oracle") {
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 'a')
      .notFollowedBy("X").where(_.kind == 'x')
      .followedBy("C").where(_.kind == 'c')
    forSamples(genEvents, 400) { events =>
      val bm = bruteNegated(events)
      val (nm, _) = NFA.run(events.iterator, (_: Ev).ts, p)
      assert(nm.map(m => (m.startTs, m.endTs)).toList == bm, s"matches differ for $events")
    }
  }

  test("negated pattern: snapshot/restore at any cut point is transparent") {
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 'a')
      .notFollowedBy("X").where(_.kind == 'x')
      .followedBy("C").where(_.kind == 'c')
    forSamples(genEvents.flatMap(es => Gen.choose(0, math.max(es.length, 1)).map((es, _))), 200) {
      case (events, cut) =>
        val single = NFA.run(events.iterator, (_: Ev).ts, p)

        val r1 = new NfaRunner[Ev](p, _.ts)
        val out1 = events.take(cut).map(r1.onEvent)
        val snap = r1.snapshot()
        val r2 = new NfaRunner[Ev](p, _.ts)
        r2.restore(snap)
        val out2 = events.drop(cut).map(r2.onEvent)
        val (flushedM, _) = r2.flush()
        val matches = ((out1 ++ out2).flatMap(_._1) ++ flushedM).map(m => (m.startTs, m.endTs))
        assert(matches == single._1.map(m => (m.startTs, m.endTs)).toList)
    }
  }
}
