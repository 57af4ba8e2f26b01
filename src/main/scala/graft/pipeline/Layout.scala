package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey
import graft.sources.Tables

/** Multi-dimensional storage layout: Z-order (Morton) clustering keys for
  * data-skipping — the write-side optimization that makes a 100 TB table
  * prunable on TWO predicate columns at once. Sorting a table by
  * `zorder_key(a, b)` (native codegen'd bit-interleave,
  * [[graft.functions.ZOrderKey]]) gives every output file min/max footer
  * stats that are narrow in `a` AND `b`; a scan filtering on either column
  * then skips most files at planning time, where a single-column sort
  * leaves the second dimension spanning the full range in every file.
  * `LayoutSpec` writes both layouts to real parquet and measures the
  * per-file spans; [[zorderWrite]] is the production write path
  * (range-partition by the key so files tile the curve contiguously).
  */
object Layout {

  /** The clustering-key computation itself, as an oracled query: lineitem's
    * (l_partkey, l_suppkey) — the two columns TPC-H co-filters — with their
    * interleaved key, ordered by it (the layout order the write path
    * produces). Narrow, codegen'd, zero shuffles except the query-facing
    * ORDER BY — at scale the same expression feeds `repartitionByRange`
    * instead of a collectable sort. */
  def zorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .withColumn("zkey", ZOrderKey($"l_partkey", $"l_suppkey"))
      .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
  }

  /** Production write path: range-partition on the Z-key (files = disjoint
    * contiguous curve segments), sort within each file, write. One range
    * exchange — the same cost as any global layout — after which both
    * dimensions prune. */
  def zorderWrite(df: DataFrame, a: String, b: String, outDir: String,
      files: Int): Unit = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumn("zkey", ZOrderKey(col(a), col(b)))
      .repartitionByRange(files, $"zkey")
      .sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(outDir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> zorder _,
  )

  val oracles: Map[String, String] = {
    // Bit-interleave spelled arithmetically: Σ_i (a_i·4^i + b_i·2·4^i).
    val z = "CAST(list_sum(list_transform(generate_series(0, 30), i -> " +
      "(((l_partkey >> i) & 1) << (2*i)) + (((l_suppkey >> i) & 1) << (2*i + 1))" +
      ")) AS BIGINT)"
    Map(
      "q_zorder" ->
        s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, $z AS zkey
           |FROM lineitem
           |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin,
    )
  }
}
