package graft.pattern

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** NFA interpreter for [[Pattern]] over a single key's event-time-ordered
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
  *   - timeouts fire when event time (the batch analog of the watermark)
  *     passes a partial match's deadline; at end of input all remaining
  *     partial matches are flushed as timeouts (batch = closed stream).
  *
  * The interpreter is SINGLE-PASS over a sorted `Iterator` — it never
  * materializes the full per-key buffer. This is what lets the Spark adapter
  * use `flatMapSortedGroups` (the shuffle delivers each key's events already
  * sorted) so per-key memory is O(live partial matches), not O(events per
  * key): live partials are bounded by the `within` horizon (every partial
  * older than `within` is retired at the next event) and `SkipPastLastEvent`
  * prunes all overlap after each match — memory is independent of total
  * stream length, which is the contract that survives 100 TB.
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

  private final case class Consumed[T](stage: Int, idx: Long, ev: T)

  // Resident position: taken == 0 → about to enter `stage`;
  // taken > 0 → inside looping `stage` having consumed `taken` events.
  private final case class Partial[T](
      stage: Int,
      taken: Int,
      consumed: List[Consumed[T]], // reverse order
      startIdx: Long,
      startTs: Long) {
    def dedupKey: (Int, Int, List[(Int, Long)]) =
      (stage, taken, consumed.map(c => (c.stage, c.idx)))
    def contentKey: List[(Int, Long)] = consumed.map(c => (c.stage, c.idx))
  }

  /** Run the pattern over events ALREADY SORTED by event time (ties broken by
    * a deterministic secondary key upstream). Returns (matches, timeouts).
    */
  def run[T](
      events: Iterator[T],
      ts: T => Long,
      pattern: Pattern[T]): (Vector[PatternMatch[T]], Vector[PatternTimeout[T]]) = {

    val stages = pattern.stages
    val n = stages.length
    val within = pattern.withinMs

    val matches = Vector.newBuilder[PatternMatch[T]]
    val timeouts = Vector.newBuilder[PatternTimeout[T]]
    var partials = ArrayBuffer.empty[Partial[T]]
    // SkipPastLastEvent: new matches may not start at or before this index.
    var minStartIdx = 0L

    // Stages s, s+1, ... reachable for entry by epsilon-skipping optional stages.
    def entryChain(s: Int): List[Int] = {
      val out = ListBuffer.empty[Int]
      var u = s
      while (u < n) {
        out += u
        if (stages(u).optionalEntry) u += 1 else u = n + 1 // stop after first mandatory
      }
      out.toList
    }

    // All concrete positions (stage, taken) from which `p` may consume/ignore.
    def positions(p: Partial[T]): List[(Int, Int)] =
      if (p.taken == 0) entryChain(p.stage).map(u => (u, 0))
      else {
        val loopSelf = if (p.taken < stages(p.stage).max) List((p.stage, p.taken)) else Nil
        val proceed =
          if (p.taken >= stages(p.stage).min) entryChain(p.stage + 1).map(u => (u, 0))
          else Nil
        loopSelf ::: proceed
      }

    def ignoreAllowed(stage: Int, taken: Int, e: T): Boolean = {
      if (stage >= n) return false
      val st = stages(stage)
      val c = if (taken == 0) st.contiguity else st.internal
      c match {
        case Contiguity.Strict => false
        case Contiguity.Relaxed => !st.pred(e)
        case Contiguity.NonDeterministic => true
      }
    }

    // Can `(stage, taken)` epsilon-reach the accepting state?
    def accepting(stage: Int, taken: Int): Boolean =
      if (stage >= n) true
      else if (taken == 0) (stage until n).forall(stages(_).optionalEntry)
      else taken >= stages(stage).min && (stage + 1 until n).forall(stages(_).optionalEntry)

    def toBindings(consumed: List[Consumed[T]]): Map[String, Vector[T]] =
      consumed.reverse
        .groupBy(_.stage)
        .map { case (s, evs) => stages(s).name -> evs.map(_.ev).toVector }

    def emitTimeout(p: Partial[T]): Unit =
      timeouts += PatternTimeout(toBindings(p.consumed), p.startTs, p.startTs + within.getOrElse(0L))

    var i = 0L
    while (events.hasNext) {
      val e = events.next()
      val t = ts(e)

      // 1. Retire partials whose horizon has passed (watermark analog: events
      //    arrive in time order, so t is the current watermark).
      within.foreach { w =>
        val (dead, alive) = partials.partition(p => t >= p.startTs + w)
        // Branch partials may share an identical consumed set (they differ only
        // in resident NFA position); one timeout per distinct partial content.
        dead.distinctBy(_.contentKey).foreach(emitTimeout)
        partials = alive
      }

      // 2. Advance every live partial plus the implicit initial state.
      val next = ArrayBuffer.empty[Partial[T]]
      val completed = ArrayBuffer.empty[Partial[T]]
      val seen = scala.collection.mutable.HashSet.empty[(Int, Int, List[(Int, Long)])]
      def add(p: Partial[T]): Unit = if (seen.add(p.dedupKey)) next += p

      def step(p: Partial[T], isInitial: Boolean): Unit = {
        positions(p).foreach { case (s, taken) =>
          if (s < n) {
            val st = stages(s)
            // TAKE
            if (taken < st.max && st.pred(e)) {
              if (!isInitial || i >= minStartIdx) {
                val newTaken = taken + 1
                val (rs, rt) = if (newTaken >= st.max) (s + 1, 0) else (s, newTaken)
                val np = Partial(rs, rt, Consumed(s, i, e) :: p.consumed,
                  if (isInitial) i else p.startIdx,
                  if (isInitial) t else p.startTs)
                if (accepting(rs, rt)) completed += np
                // Keep loop branches alive to extend (emits-and-continues for
                // trailing loops); completed singleton-final branches are done.
                if (rs < n) add(np)
              }
            }
            // IGNORE (not for the initial pseudo-partial: it is always present)
            if (!isInitial && ignoreAllowed(s, taken, e)) {
              add(if (s == p.stage && taken == p.taken) p
                  else Partial(s, 0, p.consumed, p.startIdx, p.startTs))
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

      if (completed.nonEmpty) {
        pattern.skip match {
          case AfterMatchSkip.SkipPastLastEvent =>
            // Sequential MATCH_RECOGNIZE semantics: the earliest-starting
            // (then greediest) match wins; everything overlapping is pruned.
            val win = completed.minBy(p => (p.startIdx, -p.consumed.length))
            matches += PatternMatch(toBindings(win.consumed), win.startTs, t)
            partials.clear()
            next.clear()
            minStartIdx = i + 1
          case AfterMatchSkip.NoSkip =>
            completed.foreach { p =>
              matches += PatternMatch(toBindings(p.consumed), p.startTs, t)
            }
          case AfterMatchSkip.SkipToNext =>
            val starts = completed.map(_.startIdx).toSet
            completed.groupBy(_.startIdx).toSeq.sortBy(_._1).foreach { case (_, ps) =>
              val win = ps.minBy(p => -p.consumed.length)
              matches += PatternMatch(toBindings(win.consumed), win.startTs, t)
            }
            next.filterInPlace(p => !starts.contains(p.startIdx))
          case AfterMatchSkip.SkipToFirst(v) => emitAllAndPruneBefore(v, first = true)
          case AfterMatchSkip.SkipToLast(v) => emitAllAndPruneBefore(v, first = false)
        }
      }

      partials = next
      i += 1
    }

    // 4. End of input = stream closes: flush all remaining partials as timeouts.
    partials.distinctBy(_.contentKey).foreach(emitTimeout)
    (matches.result(), timeouts.result())
  }
}
