package graft.pattern

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** NFA machinery for [[Pattern]] over a single key's event-time-ordered
  * event sequence.
  *
  * Semantics follow the reference's Flink CEP runtime as pinned by the golden
  * fixtures (`/root/reference/src/test/resources/`) and SURVEY.md §2.2:
  *   - per-event stage predicates,
  *   - quantifiers with strict / relaxed / non-deterministic contiguity
  *     (between stages and inside loops),
  *   - `within` horizon: an event at ts >= start + within cannot extend a
  *     partial match; the partial match TIMES OUT instead (absence detection,
  *     `FlinkCEPAbsenceOfEventExample.scala:78-104`),
  *   - after-match skip strategies (`SKIP PAST LAST ROW` etc.),
  *   - timeouts fire when the watermark (event time in batch) passes a
  *     partial match's deadline.
  *
  * [[NfaRunner]] is INCREMENTAL: feed events one at a time (in event-time
  * order), advance the watermark, snapshot/restore its state — this is what
  * both the batch adapter (single pass over a sorted iterator, no per-key
  * buffer) and the Structured Streaming `transformWithState` processor
  * (state store round-trips between micro-batches) drive.
  *
  * State-size contract (100 TB note): live partials per key are bounded by
  * the `within` horizon — every partial older than `within` is retired at the
  * next event/watermark — and `SkipPastLastEvent` prunes all overlap after
  * each match, so memory is O(events-in-horizon × pattern-branching),
  * independent of total stream length.
  */
object NFA {

  /** A completed match: events bound per stage, in stage order then event order. */
  final case class PatternMatch[T](
      bindings: Map[String, Vector[T]],
      startTs: Long,
      endTs: Long) {
    def apply(stage: String): Vector[T] = bindings.getOrElse(stage, Vector.empty)
    def first(stage: String): Option[T] = apply(stage).headOption
    def last(stage: String): Option[T] = apply(stage).lastOption
  }

  /** A timed-out partial match (absence detection). `deadline` = start + within. */
  final case class PatternTimeout[T](
      bindings: Map[String, Vector[T]],
      startTs: Long,
      deadline: Long) {
    def apply(stage: String): Vector[T] = bindings.getOrElse(stage, Vector.empty)
    def first(stage: String): Option[T] = apply(stage).headOption
  }

  /** One consumed event inside a partial match. */
  final case class Consumed[T](stage: Int, idx: Long, ev: T)

  /** A live partial match. Resident position: taken == 0 → about to enter
    * `stage`; taken > 0 → inside looping `stage` after `taken` events.
    * `consumed` is in reverse order. `tripped` holds stages whose preceding
    * negative guard has observed a forbidden event since the last take —
    * entering a tripped stage is blocked; any take resets the set (a new
    * gap begins).
    */
  final case class Partial[T](
      stage: Int,
      taken: Int,
      consumed: List[Consumed[T]],
      startIdx: Long,
      startTs: Long,
      tripped: Set[Int] = Set.empty) {
    def dedupKey: (Int, Int, List[(Int, Long)], Set[Int]) =
      (stage, taken, consumed.map(c => (c.stage, c.idx)), tripped)
    def contentKey: List[(Int, Long)] = consumed.map(c => (c.stage, c.idx))
  }

  /** Serializable snapshot of a runner's mutable state (streaming state store).
    * `champion` is a completed-but-still-extendable maximal-match candidate
    * (trailing greedy loop, single-winner skip) with its completion endTs. */
  final case class Snapshot[T](
      partials: List[Partial[T]],
      minStartIdx: Long,
      nextIdx: Long,
      champion: Option[(Partial[T], Long)] = None,
      /** Last `historyDepth` fed events (oldest first) for physical
        * `PatternContext.recent` navigation. */
      history: List[T] = Nil)

  /** Convenience single-shot run over a sorted iterator: feed every event,
    * then flush (batch = closed stream → remaining partials time out).
    */
  def run[T](
      events: Iterator[T],
      ts: T => Long,
      pattern: Pattern[T]): (Vector[PatternMatch[T]], Vector[PatternTimeout[T]]) = {
    val runner = new NfaRunner[T](pattern, ts)
    val matches = Vector.newBuilder[PatternMatch[T]]
    val timeouts = Vector.newBuilder[PatternTimeout[T]]
    events.foreach { e =>
      val (ms, tos) = runner.onEvent(e)
      matches ++= ms
      timeouts ++= tos
    }
    val (fm, ft) = runner.flush()
    matches ++= fm
    timeouts ++= ft
    (matches.result(), timeouts.result())
  }
}

/** Incremental NFA executor for one key. NOT thread-safe. */
final class NfaRunner[T](val pattern: Pattern[T], tsFn: T => Long) extends Serializable {
  import NFA._

  require(pattern.pendingGuard.isEmpty,
    "pattern must not end with a negative stage (notFollowedBy/notNext need a following stage)")

  private val stages = pattern.stages
  private val n = stages.length
  private val within = pattern.withinMs
  private val guards = pattern.guards
  // Greedy (default): longest simultaneous completion wins under
  // single-winner skip modes; any reluctant loop flips to shortest.
  private val lenPref: Int => Int =
    if (stages.filter(_.isLoop).forall(_.greedy)) len => -len else len => len

  // Maximal-match deferral (SQL greedy semantics): when the pattern ENDS in
  // a greedy loop under a single-winner skip mode, a completion that can
  // still extend is held here (with its completion endTs) instead of being
  // emitted; it is replaced by longer completions of the same attempt and
  // emitted only when the attempt can no longer grow (branch death, within
  // horizon, or end of input).
  private val preferLongest = stages.filter(_.isLoop).forall(_.greedy)
  private var champion: Option[(Partial[T], Long)] = None

  private var partials = ArrayBuffer.empty[Partial[T]]
  private var minStartIdx = 0L // SkipPastLastEvent: no starts at or before this
  private var nextIdx = 0L

  // Physical-history ring for PatternContext.recent (PREV navigation);
  // bounded by the pattern's declared historyDepth, zero-cost when unused.
  private var history: Vector[T] = Vector.empty

  def snapshot(): Snapshot[T] =
    Snapshot(partials.toList, minStartIdx, nextIdx, champion, history.toList)

  def restore(s: Snapshot[T]): Unit = {
    partials = ArrayBuffer.from(s.partials)
    minStartIdx = s.minStartIdx
    nextIdx = s.nextIdx
    champion = s.champion
    history = s.history.toVector
  }

  // History counts as live state: physical PREV navigation must survive
  // across match boundaries and quiet periods (O(historyDepth) per key,
  // paid only by patterns that declare it).
  def hasLiveState: Boolean =
    partials.nonEmpty || champion.isDefined ||
      (pattern.historyDepth > 0 && history.nonEmpty)

  /** Earliest pending timeout deadline, if any (streaming timer target). */
  def earliestDeadline: Option[Long] =
    within.flatMap(w =>
      (partials.map(_.startTs + w) ++ champion.map(_._1.startTs + w)).minOption)

  private def lastIdxOf(p: Partial[T]): Long = p.consumed.head.idx

  private def toMatch(p: Partial[T], endTs: Long): PatternMatch[T] =
    PatternMatch(toBindings(p.consumed), p.startTs, endTs)

  // Stages s, s+1, ... reachable for entry by epsilon-skipping optional stages.
  private def entryChain(s: Int): List[Int] = {
    val out = ListBuffer.empty[Int]
    var u = s
    while (u < n) {
      out += u
      if (stages(u).optionalEntry) u += 1 else u = n + 1 // stop after first mandatory
    }
    out.toList
  }

  private def positions(p: Partial[T]): List[(Int, Int)] =
    if (p.taken == 0) entryChain(p.stage).map(u => (u, 0))
    else {
      val loopSelf = if (p.taken < stages(p.stage).max) List((p.stage, p.taken)) else Nil
      val proceed =
        if (p.taken >= stages(p.stage).min) entryChain(p.stage + 1).map(u => (u, 0))
        else Nil
      loopSelf ::: proceed
    }

  // Lazy bindings view for iterative conditions (simple conditions never
  // force it, so the common path allocates nothing but the closure).
  private def ctxOf(p: Partial[T]): PatternContext[T] = new PatternContext[T] {
    private lazy val b = toBindings(p.consumed)
    def apply(stage: String): Vector[T] = b.getOrElse(stage, Vector.empty)
    // history excludes the current candidate (appended AFTER stepping)
    override def recent(n: Int): Option[T] =
      if (n >= 1 && n <= history.length) Some(history(history.length - n)) else None
  }

  private def ignoreAllowed(stage: Int, taken: Int, e: T, ctx: PatternContext[T]): Boolean = {
    if (stage >= n) return false
    val st = stages(stage)
    val c = if (taken == 0) st.contiguity else st.internal
    c match {
      case Contiguity.Strict => false
      case Contiguity.Relaxed => !st.pred(e, ctx)
      case Contiguity.NonDeterministic => true
    }
  }

  // Can `(stage, taken)` epsilon-reach the accepting state?
  private def accepting(stage: Int, taken: Int): Boolean =
    if (stage >= n) true
    else if (taken == 0) (stage until n).forall(stages(_).optionalEntry)
    else taken >= stages(stage).min && (stage + 1 until n).forall(stages(_).optionalEntry)

  private def toBindings(consumed: List[Consumed[T]]): Map[String, Vector[T]] =
    consumed.reverse
      .groupBy(_.stage)
      .map { case (s, evs) => stages(s).name -> evs.map(_.ev).toVector }

  private def toTimeout(p: Partial[T]): PatternTimeout[T] =
    PatternTimeout(toBindings(p.consumed), p.startTs, p.startTs + within.getOrElse(0L))

  /** Retire partials whose `within` horizon is at or before watermark `w`;
    * a deferred maximal-match champion whose horizon passed EMITS (it is a
    * completed match that merely could not extend further). */
  def onWatermark(w: Long): (List[PatternMatch[T]], List[PatternTimeout[T]]) =
    within match {
      case None => (Nil, Nil)
      case Some(h) =>
        val champ = champion match {
          case Some((ch, endTs)) if w >= ch.startTs + h =>
            minStartIdx = math.max(minStartIdx, lastIdxOf(ch) + 1)
            // the attempt family overlaps the emitted match: pruned silently
            partials.filterInPlace(_.startIdx >= minStartIdx)
            champion = None
            List(toMatch(ch, endTs))
          case _ => Nil
        }
        val (dead, alive) = partials.partition(p => w >= p.startTs + h)
        partials = alive
        // Branch partials may share an identical consumed set (they differ
        // only in resident NFA position); one timeout per distinct content.
        (champ, dead.distinctBy(_.contentKey).map(toTimeout).toList)
    }

  /** Feed the next event (must be >= all previously fed event times). */
  def onEvent(e: T): (List[PatternMatch[T]], List[PatternTimeout[T]]) = {
    val t = tsFn(e)
    val i = nextIdx
    nextIdx += 1

    // 1. The event's own time is a watermark: horizons at or before it fire first.
    val (wmMatches, timeouts) = onWatermark(t)

    // 2. Advance every live partial plus the implicit initial state.
    val matches = ListBuffer.empty[PatternMatch[T]]
    val next = ArrayBuffer.empty[Partial[T]]
    val completed = ArrayBuffer.empty[Partial[T]]
    val seen = scala.collection.mutable.HashSet.empty[(Int, Int, List[(Int, Long)], Set[Int])]
    def add(p: Partial[T]): Unit = if (seen.add(p.dedupKey)) next += p

    def step(p: Partial[T], isInitial: Boolean): Unit = {
      val ctx = ctxOf(p)
      // Stages whose preceding negative guard fires on THIS event (the gap
      // between the previous take and a future entry now contains a
      // forbidden event). Taking a stage on this same event still wins: the
      // forbidden range is exclusive of the event that anchors the entry.
      val trippedNow: Set[Int] =
        if (isInitial || guards.isEmpty) Set.empty
        else positions(p).iterator.collect { case (s, 0) => s }.flatMap { s =>
          guards.get(s) match {
            case Some(g: Guard.NotFollowed[T]) if g.pred(e, ctx) => Some(s)
            case Some(g: Guard.NotNext[T])
              if p.consumed.nonEmpty && i == p.consumed.head.idx + 1 &&
                g.pred(e, ctx) => Some(s)
            case _ => None
          }
        }.toSet
      positions(p).foreach { case (s, taken) =>
        if (s < n) {
          val st = stages(s)
          // TAKE (blocked into a stage whose guard tripped earlier in the gap)
          if (taken < st.max && !(taken == 0 && p.tripped(s)) && st.pred(e, ctx)) {
            if (!isInitial || i >= minStartIdx) {
              val newTaken = taken + 1
              val (rs, rt) = if (newTaken >= st.max) (s + 1, 0) else (s, newTaken)
              val np = Partial(rs, rt, Consumed(s, i, e) :: p.consumed,
                if (isInitial) i else p.startIdx,
                if (isInitial) t else p.startTs)
              if (accepting(rs, rt)) completed += np
              // Keep loop branches alive to extend (emit-and-continue for
              // trailing loops); completed singleton-final branches are done.
              if (rs < n) add(np)
            }
          }
          // IGNORE (not for the initial pseudo-partial: it is always present)
          if (!isInitial && ignoreAllowed(s, taken, e, ctx)) {
            val tr = p.tripped ++ trippedNow
            add(if (s == p.stage && taken == p.taken && tr == p.tripped) p
                else Partial(s, taken, p.consumed, p.startIdx, p.startTs, tr))
          }
        }
      }
    }

    partials.foreach(step(_, isInitial = false))
    step(Partial(0, 0, Nil, i, t), isInitial = true)

    // 3. Emit completions per the after-match skip strategy.
    def emitAllAndPruneBefore(v: String, first: Boolean): Unit = {
      var bound = Long.MaxValue
      completed.foreach { p =>
        matches += PatternMatch(toBindings(p.consumed), p.startTs, t)
        val idxs = p.consumed.filter(c => stages(c.stage).name == v).map(_.idx)
        if (idxs.nonEmpty) bound = math.min(bound, if (first) idxs.min else idxs.max)
      }
      if (bound != Long.MaxValue)
        next.filterInPlace(p => p.startIdx >= bound)
    }

    // Sequential MATCH_RECOGNIZE semantics under SkipPastLastEvent: the
    // earliest-starting, then greediest, match wins and everything
    // overlapping is pruned. A winning completion that can still EXTEND
    // (trailing greedy loop) is deferred as `champion` — the maximal match
    // emits when the attempt can no longer grow.
    def resolveSkipPast(comp: Seq[Partial[T]]): Unit =
      if (comp.nonEmpty) {
        val win = comp.minBy(p => (p.startIdx, lenPref(p.consumed.length)))
        // Deferral applies only when the WINNING completion itself remains
        // live (trailing-loop/optional-tail position re-added to `next`) —
        // a completion whose resident position is final emits eagerly, the
        // sequential first-complete-wins semantics the fixtures pin.
        val extendable = preferLongest && next.exists(_.dedupKey == win.dedupKey)
        if (extendable) {
          champion = Some((win, t))
          // keep the winning attempt's family + attempts past its current end
          next.filterInPlace(p =>
            p.startIdx == win.startIdx || p.startIdx > lastIdxOf(win))
        } else {
          matches += toMatch(win, t)
          next.clear()
          minStartIdx = i + 1
        }
      }

    if (completed.nonEmpty || champion.isDefined) {
      pattern.skip match {
        case AfterMatchSkip.SkipPastLastEvent =>
          champion match {
            case Some((ch, chEnd)) =>
              val ext = completed.filter(c =>
                c.startIdx == ch.startIdx && c.consumed.length > ch.consumed.length)
              if (ext.nonEmpty) {
                val w2 = ext.minBy(c => lenPref(c.consumed.length))
                champion = Some((w2, t))
                next.filterInPlace(p =>
                  p.startIdx == w2.startIdx || p.startIdx > lastIdxOf(w2))
              } else if (!next.exists(_.startIdx == ch.startIdx)) {
                // attempt family died: the deferred match is maximal — emit,
                // then resume after its last row
                matches += toMatch(ch, chEnd)
                minStartIdx = math.max(minStartIdx, lastIdxOf(ch) + 1)
                next.filterInPlace(_.startIdx >= minStartIdx)
                champion = None
                resolveSkipPast(completed.filter(_.startIdx >= minStartIdx).toSeq)
              }
            // else: champion alive — later-starting completions overlap the
            // still-growing maximal match and are suppressed
            case None => resolveSkipPast(completed.toSeq)
          }
        case AfterMatchSkip.NoSkip =>
          completed.foreach { p =>
            matches += PatternMatch(toBindings(p.consumed), p.startTs, t)
          }
        case AfterMatchSkip.SkipToNext =>
          val starts = completed.map(_.startIdx).toSet
          completed.groupBy(_.startIdx).toSeq.sortBy(_._1).foreach { case (_, ps) =>
            val win = ps.minBy(p => lenPref(p.consumed.length))
            matches += PatternMatch(toBindings(win.consumed), win.startTs, t)
          }
          next.filterInPlace(p => !starts.contains(p.startIdx))
        case AfterMatchSkip.SkipToFirst(v) => emitAllAndPruneBefore(v, first = true)
        case AfterMatchSkip.SkipToLast(v) => emitAllAndPruneBefore(v, first = false)
      }
    }

    // A waiting partial whose every reachable entry stage is guard-blocked
    // can never advance: drop it now so it doesn't linger as state (matters
    // for unbounded-horizon patterns under NoSkip).
    if (guards.nonEmpty)
      next.filterInPlace(p =>
        !(p.taken == 0 && p.consumed.nonEmpty && entryChain(p.stage).forall(p.tripped)))

    if (pattern.historyDepth > 0) {
      history = history :+ e
      if (history.length > pattern.historyDepth) history = history.takeRight(pattern.historyDepth)
    }

    partials = next
    (wmMatches ++ matches.toList, timeouts)
  }

  /** End of input (batch only): a deferred maximal match emits; attempts it
    * overlaps are covered by it, every other remaining partial times out. */
  def flush(): (List[PatternMatch[T]], List[PatternTimeout[T]]) = {
    val ms = champion.toList.map { case (ch, endTs) =>
      minStartIdx = math.max(minStartIdx, lastIdxOf(ch) + 1)
      partials.filterInPlace(_.startIdx >= minStartIdx)
      toMatch(ch, endTs)
    }
    champion = None
    val out = partials.distinctBy(_.contentKey).map(toTimeout).toList
    partials.clear()
    (ms, out)
  }
}
