package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the bench's contention self-labeling (r13 verdict #2):
  * the canary, the re-run rule, the previous-detail parser, and the
  * detail-JSON shape the driver and judge read. */
class BenchKitSpec extends AnyFunSuite {

  test("canaryMs: positive, and repeats within the same order of magnitude " +
    "(fixed work — the whole point is that only HOST contention moves it)") {
    val a = BenchKit.canaryMs()
    val b = BenchKit.canaryMs()
    assert(a > 0 && b > 0)
    assert(a / b < 10 && b / a < 10,
      s"two back-to-back canaries in one process diverged >10×: $a vs $b ms")
    // the parallel canary saturates CanaryThreads cores — positive, and
    // its fixed work is CanarySteps/4 per thread, so it stays the same
    // order of magnitude as the single-thread loop on any box
    val p = BenchKit.canaryParMs()
    assert(p > 0 && p / a < 20 && a / p < 20,
      s"parallel canary out of range: $p ms vs single $a ms")
    // the bandwidth canary streams fixed DRAM traffic — positive and
    // same order of magnitude run-to-run
    val m1 = BenchKit.canaryMemMs()
    val m2 = BenchKit.canaryMemMs()
    assert(m1 > 0 && m2 > 0 && m1 / m2 < 10 && m2 / m1 < 10,
      s"bandwidth canaries diverged: $m1 vs $m2 ms")
  }

  test("rerunThreshold: max(5 s, 2× previous committed time); new or " +
    "errored previous entries fall back to the 5 s floor") {
    assert(BenchKit.rerunThreshold(None) == 5.0)
    assert(BenchKit.rerunThreshold(Some(0.4)) == 5.0)
    assert(BenchKit.rerunThreshold(Some(2.5)) == 5.0)
    assert(BenchKit.rerunThreshold(Some(4.0)) == 8.0)
    assert(BenchKit.rerunThreshold(Some(-1.0)) == 5.0, "errored prev = floor")
  }

  test("parseDetailQueries round-trips the bench's own detail format") {
    val detail = BenchKit.detailJson(
      results = Map("q_a" -> 1.234, "q_b" -> -1.0, "q_c" -> 6.5),
      errors = Map("q_b" -> "boom \"quoted\""),
      reruns = Map("q_c" -> BenchKit.Rerun(first = 14.2, rerun = 6.5)),
      canaries = Seq(31.0, 30.5, 95.25),
      canariesPar = Seq(40.0, 41.0, 160.5),
      canariesMem = Seq(50.0, 52.0, 201.0),
      ivfBuildSec = 8.1, mhBuildSec = 6.0, sfDir = "/data/sf0.1")
    val qs = BenchKit.parseDetailQueries(detail)
    assert(qs == Map("q_a" -> 1.234, "q_b" -> -1.0, "q_c" -> 6.5))
    assert(BenchKit.parseDetailQueries("{\"no_queries\":1}") == Map.empty)
  }

  test("detailJson shape: canary_ms array, reruns with first/rerun, " +
    "min-based total and budget_warn, escaped errors") {
    val detail = BenchKit.detailJson(
      results = Map("q_a" -> 1.0, "q_b" -> -1.0, "q_c" -> 6.5),
      errors = Map("q_b" -> "boom \"quoted\"\nline2"),
      reruns = Map("q_c" -> BenchKit.Rerun(first = 14.2, rerun = 6.5)),
      canaries = Seq(31.0, 30.5, 95.25),
      canariesPar = Seq(40.0, 41.0, 160.5),
      canariesMem = Seq(50.0, 52.0, 201.0),
      ivfBuildSec = 8.1, mhBuildSec = 6.0, sfDir = "/data/sf0.1")
    assert(detail.contains("\"canary_ms\":[31.000,30.500,95.250]"))
    assert(detail.contains("\"canary_par_ms\":[40.000,41.000,160.500]"))
    assert(detail.contains("\"canary_mem_ms\":[50.000,52.000,201.000]"))
    assert(detail.contains(
      "\"reruns\":{\"q_c\":{\"first\":14.200,\"rerun\":6.500}}"))
    // total sums the SERVING times (min of first/rerun), skipping errors
    assert(detail.contains("\"value\":7.500"))
    // budget_warn reads the serving time too: q_c's 6.5 min still warns
    assert(detail.contains("\"budget_warn\":[\"q_c\"]"))
    assert(detail.contains("\\\"quoted\\\"") && detail.contains("\\n"))
    assert(detail.contains("\"queries\":{\"q_a\":1.000,\"q_b\":-1,\"q_c\":6.500}"))
    // a well-formed single JSON object: balanced braces, one line
    assert(!detail.contains("\n"))
    assert(detail.count(_ == '{') == detail.count(_ == '}'))
  }
}
