package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Temperature-mixture rate table: pins the α-flattening property the
  * XLM-R sampling rule exists for (small sources get HIGHER keep-rates
  * than proportional sampling would give, large sources lower), which the
  * oracle compare alone can't distinguish from proportional sampling.
  */
class MixtureTemperatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ratesFor(sizes: Map[String, Int]): Map[String, Long] = {
    import spark.implicits._
    val docs = sizes.toSeq.flatMap { case (src, n) =>
      (0 until n).map(i => (src.hashCode.toLong * 1000 + i, src, 100L))
    }.toDF("doc_id", "source", "n_chars")
    Mixture.temperatureRates(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("small sources get higher keep-rates than large sources") {
    val r = ratesFor(Map("big" -> 400, "small" -> 25))
    assert(r("small") > r("big"),
      s"temperature must up-weight the small source: $r")
    // flattening, not uniformity: the big source still keeps MORE expected
    // chars overall (rate_big * n_big > rate_small * n_small)
    assert(r("big") * 400L > r("small") * 25L, s"over-flattened: $r")
  }

  test("equal sources get equal rates") {
    val r = ratesFor(Map("a" -> 100, "b" -> 100))
    assert(r("a") == r("b"), s"symmetric inputs must tie: $r")
  }

  test("rates are capped at 1e6 micros") {
    val r = ratesFor(Map("tiny" -> 1, "alsotiny" -> 1))
    assert(r.values.forall(v => v > 0 && v <= 1000000L), s"cap violated: $r")
  }
}
