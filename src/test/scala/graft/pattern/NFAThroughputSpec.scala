package graft.pattern

import org.scalatest.funsuite.AnyFunSuite

/** Throughput floor for the pure NFA core (BASELINE.md: ≥ 50k events/s
  * through the batch NFA; the Spark adapter adds only shuffle + codegen'd
  * scan around this loop). Deliberately asserts 4× the floor single-threaded
  * with a wide margin against machine noise — local[32] parallelism then
  * multiplies per-key throughput.
  */
class NFAThroughputSpec extends AnyFunSuite {

  case class Ev(ts: Long, kind: Int)

  test("single-threaded NFA sustains >= 200k events/s on a CEP-shaped stream") {
    val rnd = new scala.util.Random(42)
    val n = 1000000
    val events = Array.tabulate(n)(i => Ev(i.toLong * 10, rnd.nextInt(10)))
    // A(kind 0) B*(1-6) C(7) within 500 ticks, skip past last — mirrors the
    // billing/events query shape: mostly-dying partials, some timeouts.
    val p = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 0)
      .next("B").where(e => e.kind >= 1 && e.kind <= 6).oneOrMore.optional
      .next("C").where(_.kind == 7)
      .within(500)

    // warmup (JIT)
    NFA.run(events.iterator.take(100000), (_: Ev).ts, p)
    val t0 = System.nanoTime()
    val (ms, ts) = NFA.run(events.iterator, (_: Ev).ts, p)
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = n / secs
    info(f"NFA rate: ${rate / 1000}%.0fk events/s (${ms.size} matches, ${ts.size} timeouts)")
    assert(ms.nonEmpty && ts.nonEmpty)
    assert(rate >= 200000, f"NFA throughput $rate%.0f events/s below floor")
  }
}
