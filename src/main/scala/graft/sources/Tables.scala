package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * `events.ts` is nanosecond-precision parquet (INT64 TIMESTAMP(NANOS)) which
  * Spark does not read natively — it is read as raw nanos via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncated to a microsecond
  * `TimestampType` column (FIXTURES.md §B.1 timestamp caveat: every
  * cross-engine comparison additionally truncates to seconds).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` as a proper microsecond TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    // With the legacy conf the NANOS column arrives as LongType (ns since epoch).
    raw.schema("ts").dataType.typeName match {
      case "long" | "bigint" =>
        raw.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      case "timestamp_ntz" =>
        // timestamp[us] without timezone (TIMESTAMP_NTZ): reinterpret the
        // wall-clock value as UTC, matching the session-timezone pin and the
        // oracle's naive-timestamp semantics.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a timestamp (future Spark native ns support)
    }
  }
}
