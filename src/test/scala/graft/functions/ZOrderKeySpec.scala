package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def ref(a: Long, b: Long): Long =
    (0 until ZOrderKey.Bits).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("mask-cascade interleave matches the bit-by-bit reference") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0x7fffffffL, 0x7fffffffL), (12345L, 67890L),
      (0x55555555L, 0x2aaaaaaaL), (1L << 30, (1L << 30) - 1))
    cases.foreach { case (a, b) =>
      assert(ZOrderKey.interleave(a, b) === ref(a, b), s"($a, $b)")
    }
  }

  test("key preserves locality order along each axis") {
    // with the other coordinate fixed, the key is monotone in either input
    val keys = (0L to 100L).map(a => ZOrderKey.interleave(a, 37L))
    assert(keys === keys.sorted)
    val keysB = (0L to 100L).map(b => ZOrderKey.interleave(37L, b))
    assert(keysB === keysB.sorted)
  }

  test("out-of-range inputs raise instead of folding") {
    intercept[IllegalArgumentException](ZOrderKey.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrderKey.interleave(0L, 1L << 31))
  }

  test("codegen path agrees with interpreted eval") {
    val df = Seq((12345L, 67890L), (0L, 0L), (2147483647L, 1L))
      .toDF("a", "b")
      .select(ZOrderKey($"a", $"b").as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(ref(12345L, 67890L), 0L, ref(2147483647L, 1L)))
  }
}
