package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order layout must actually buy two-dimensional data skipping: written
  * as real parquet, the per-file min/max spans of BOTH key columns have to
  * be narrow, where a single-column sort leaves the second column spanning
  * ~the full domain in every file. This is measured on the files
  * themselves, not asserted from theory.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z-order write narrows per-file spans in both dimensions") {
    // uniform 2-d grid — the shape where one-column sorting provably can't
    // cluster the other dimension
    val n = 1 << 14
    val side = 1L << 7
    val df = spark.range(n.toLong)
      .select(($"id" % side).as("a"), ($"id" / side).cast("long").as("b"))
    val files = 16

    val zDir = Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(df, "a", "b", zDir, files)
    val sDir = Files.createTempDirectory("singlesort").toString
    df.repartitionByRange(files, $"a")
      .sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(sDir)

    def meanSpans(dir: String): (Double, Double) = {
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val spans = parts.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max($"a") - min($"a"), max($"b") - min($"b")).collect()(0)
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }

    val (za, zb) = meanSpans(zDir)
    val (sa, sb) = meanSpans(sDir)
    val domain = side.toDouble - 1
    // single-column sort: a clusters, b spans the whole domain per file
    assert(sa <= domain / 4)
    assert(sb >= domain * 0.9)
    // z-order: BOTH dimensions well under the domain in the average file
    assert(za <= domain / 2, s"z-order a-span $za vs domain $domain")
    assert(zb <= domain / 2, s"z-order b-span $zb vs domain $domain")
  }
}
