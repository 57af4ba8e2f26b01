package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins TIMESTAMP_NTZ input handling end-to-end, so a testdata
  * regeneration changing the parquet timestamp flavor can't silently break
  * the CEP/MATCH_RECOGNIZE core again (r5: the driver switched events.ts
  * from INT64 TIMESTAMP(NANOS) to timestamp[us] *without* timezone — read
  * as TIMESTAMP_NTZ — and all 9 declared CEP/MR queries errored).
  *
  * Stages the SAME events twice — once as TIMESTAMP (UTC-adjusted), once as
  * TIMESTAMP_NTZ — and asserts [[Tables.events]], the CEP operator, and the
  * MATCH_RECOGNIZE front-end produce identical output on both, under the
  * UTC session pin.
  */
class NtzEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val (utcDir, ntzDir) = {
    val canonical = Tables.events(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files.createTempDirectory("ntz_events")
    val utc = base.resolve("utc").toString
    val ntz = base.resolve("ntz").toString
    canonical.write.mode("overwrite").parquet(s"$utc/events.parquet")
    canonical.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$ntz/events.parquet")
    (utc, ntz)
  }

  test("Tables.events reads TIMESTAMP and TIMESTAMP_NTZ identically") {
    val a = Tables.events(spark, utcDir)
    val b = Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType == b.schema("ts").dataType)
    val rowsA = a.orderBy("event_id").collect().map(_.toString)
    val rowsB = b.orderBy("event_id").collect().map(_.toString)
    assert(rowsA.nonEmpty && rowsA.sameElements(rowsB))
  }

  test("CEP over NTZ events equals CEP over UTC events") {
    val a = graft.operators.EventPatterns.lowBalance(spark, utcDir).collect()
    val b = graft.operators.EventPatterns.lowBalance(spark, ntzDir).collect()
    assert(a.nonEmpty && a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("MATCH_RECOGNIZE over NTZ events equals UTC events") {
    val a = graft.sql.MrQueries.lowBalance(spark, utcDir).collect()
    val b = graft.sql.MrQueries.lowBalance(spark, ntzDir).collect()
    assert(a.nonEmpty && a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("MATCH_RECOGNIZE accepts a raw TIMESTAMP_NTZ ORDER BY column") {
    import spark.implicits._
    // bypass Tables.events: hand MatchRecognize the NTZ column directly, so
    // the runtime's LocalDateTime ORDER BY path is the one under test
    val ev = spark.read.parquet(s"$ntzDir/events.parquet")
      .select($"event_id", $"ts", $"user_id", $"event_type")
    assert(ev.schema("ts").dataType.typeName == "timestamp_ntz")
    val out = graft.sql.MatchRecognize(ev,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES A.ts AS alarm_ts, C.ts AS topup_ts
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
        |DEFINE
        |  A AS A.event_type = 'error',
        |  B AS B.event_type = 'view' OR B.event_type = 'click',
        |  C AS C.event_type = 'purchase'""".stripMargin)
    assert(out.count() > 0)
  }
}
