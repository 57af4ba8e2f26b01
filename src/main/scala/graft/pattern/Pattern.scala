package graft.pattern

/** Declarative event-pattern DSL — the engine's equivalent of the reference's
  * Flink CEP `Pattern` API (`/root/reference/src/main/scala/kosmag/FlinkCEPExample.scala:58-74`)
  * and of the `PATTERN (A B* C) ... DEFINE` clause of SQL MATCH_RECOGNIZE
  * (`FlinkSqlMatchRecognizeExample.scala:50-68`).
  *
  * A pattern is an ordered sequence of [[Stage]]s. Each stage has:
  *   - a name (the pattern variable, e.g. "A"),
  *   - a predicate over the event type,
  *   - a quantifier `(min, max)` — `(1,1)` singleton, `(0,1)` optional,
  *     `(1,∞)` oneOrMore, `(0,∞)` oneOrMore.optional, `(n,n)` times(n),
  *   - the contiguity to the PREVIOUS stage (`next` = strict, `followedBy` =
  *     relaxed, `followedByAny` = non-deterministic relaxed),
  *   - the internal contiguity between repetitions of a looping stage
  *     (relaxed by default, strict after `.consecutive()`, non-deterministic
  *     after `.allowCombinations()`).
  *
  * The compiled form is interpreted by [[NFA]]. No Spark dependency here —
  * the core is pure Scala and unit-testable without a session.
  */
sealed trait Contiguity
object Contiguity {
  /** `next()` — the matching event must be the immediate successor. */
  case object Strict extends Contiguity
  /** `followedBy()` — non-matching events in between are ignored. */
  case object Relaxed extends Contiguity
  /** `followedByAny()` — matching events may also be skipped (branching). */
  case object NonDeterministic extends Contiguity
}

/** After-match skip strategy — reference: `AfterMatchSkipStrategy.skipPastLastEvent()`
  * (`FlinkCEPExample.scala:58`) / SQL `AFTER MATCH SKIP PAST LAST ROW`
  * (`FlinkSqlMatchRecognizeExample.scala:61`).
  */
sealed trait AfterMatchSkip
object AfterMatchSkip {
  /** Emit every match, prune nothing: fully overlapping matches allowed. */
  case object NoSkip extends AfterMatchSkip
  /** Resume after the last event of a completed match; prune all partial
    * matches that overlap it (no overlapping matches). */
  case object SkipPastLastEvent extends AfterMatchSkip
  /** Prune only partial matches that share the completed match's start event. */
  case object SkipToNext extends AfterMatchSkip
  /** Prune partial matches starting before the first event bound to `variable`. */
  final case class SkipToFirst(variable: String) extends AfterMatchSkip
  /** Prune partial matches starting before the last event bound to `variable`. */
  final case class SkipToLast(variable: String) extends AfterMatchSkip
}

/** One pattern variable. `max = Int.MaxValue` encodes unbounded repetition. */
final case class Stage[T](
    name: String,
    pred: T => Boolean,
    min: Int,
    max: Int,
    contiguity: Contiguity,
    internal: Contiguity) {
  def isLoop: Boolean = max > 1
  def optionalEntry: Boolean = min == 0
}

final case class Pattern[T](
    stages: Vector[Stage[T]],
    withinMs: Option[Long],
    skip: AfterMatchSkip) {

  private def updLast(f: Stage[T] => Stage[T]): Pattern[T] =
    copy(stages = stages.init :+ f(stages.last))

  /** AND an additional condition onto the current stage. */
  def where(p: T => Boolean): Pattern[T] =
    updLast(s => s.copy(pred = e => s.pred(e) && p(e)))

  /** OR an alternative condition onto the current stage. */
  def or(p: T => Boolean): Pattern[T] =
    updLast(s => s.copy(pred = e => s.pred(e) || p(e)))

  private def append(name: String, c: Contiguity): Pattern[T] =
    copy(stages = stages :+ Stage[T](name, _ => true, 1, 1, c, Contiguity.Relaxed))

  /** Strict contiguity to the previous stage (Flink `next`). */
  def next(name: String): Pattern[T] = append(name, Contiguity.Strict)
  /** Relaxed contiguity (Flink `followedBy`). */
  def followedBy(name: String): Pattern[T] = append(name, Contiguity.Relaxed)
  /** Non-deterministic relaxed contiguity (Flink `followedByAny`). */
  def followedByAny(name: String): Pattern[T] = append(name, Contiguity.NonDeterministic)

  /** Current stage repeats 1..∞ times. */
  def oneOrMore: Pattern[T] = updLast(_.copy(min = 1, max = Int.MaxValue))
  /** Current stage repeats exactly `n` times. */
  def times(n: Int): Pattern[T] = updLast(_.copy(min = n, max = n))
  /** Current stage repeats `from`..`to` times. */
  def times(from: Int, to: Int): Pattern[T] = updLast(_.copy(min = from, max = to))
  /** Lower the current stage's minimum to zero (combine with oneOrMore for `*`). */
  def optional: Pattern[T] = updLast(_.copy(min = 0))
  /** Repetitions of the current (looping) stage must be strictly contiguous. */
  def consecutive: Pattern[T] = updLast(_.copy(internal = Contiguity.Strict))
  /** Repetitions may non-deterministically skip matching events. */
  def allowCombinations: Pattern[T] = updLast(_.copy(internal = Contiguity.NonDeterministic))

  /** Whole-match time horizon: last event ts must be < first event ts + millis
    * (reference: `within(Time.hours(1))`, `FlinkCEPExample.scala:74`). */
  def within(millis: Long): Pattern[T] = copy(withinMs = Some(millis))

  def withSkipStrategy(s: AfterMatchSkip): Pattern[T] = copy(skip = s)

  def stageNames: Vector[String] = stages.map(_.name)

  /** Re-target the pattern onto a wrapper/projection of the event type
    * (e.g. the same events with a watermark timestamp column attached). */
  def contramap[U](f: U => T): Pattern[U] =
    Pattern(
      stages.map(s => Stage[U](s.name, u => s.pred(f(u)), s.min, s.max, s.contiguity, s.internal)),
      withinMs, skip)
}

object Pattern {
  /** Start a pattern with its first variable (Flink `Pattern.begin`). */
  def begin[T](name: String,
               skip: AfterMatchSkip = AfterMatchSkip.NoSkip): Pattern[T] =
    Pattern(Vector(Stage[T](name, _ => true, 1, 1, Contiguity.Strict, Contiguity.Relaxed)),
      None, skip)
}
