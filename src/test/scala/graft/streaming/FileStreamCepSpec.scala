package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.EventPatterns
import graft.pattern.NFA

/** File-based streaming ingestion (the production source shape): the events
  * parquet staged into a watched directory, read with `readStream`, through
  * the CEP operator — matches equal the batch run (all files present up
  * front ⇒ one load; the watermark passes every match point).
  */
class FileStreamCepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readStream.parquet through CEP equals batch matches") {
    import spark.implicits._
    import EventPatterns.EventRow

    // stage the parquet file into a directory for the file stream source
    val dir = java.nio.file.Files.createTempDirectory("cep_files")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))

    val batchMatches = EventPatterns.lowBalance(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val tsToEts = schema("ts").dataType.typeName match {
      case "long" | "bigint" => timestamp_micros(floor(col("ts") / 1000L).cast("long"))
      case _                 => col("ts").cast("timestamp") // TIMESTAMP_NTZ under UTC pin
    }
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ets", tsToEts)
      .withWatermark("ets", "0 seconds")
      .select(col("event_id"), unix_micros(col("ets")).as("ts_us"),
        col("user_id"), col("event_type"))
      .as[EventRow]

    val out = CepStream.matchPattern[Long, EventRow, (Long, Long, Long)](
      stream, _.user_id, _.ts_us / 1000L, EventPatterns.pattern,
      (k, m: NFA.PatternMatch[EventRow]) =>
        m.first("A").zip(m.first("C")).map { case (a, c) => (k, a.ts_us, c.ts_us) },
      (_, _: NFA.PatternTimeout[EventRow]) => None)
    val q = out.writeStream.format("memory").queryName("file_cep")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def sec(us: Long) = new java.sql.Timestamp(us / 1000000L * 1000L)
      val got = spark.table("file_cep").collect()
        .map(r => s"[${r.getLong(0)},${sec(r.getLong(1))},${sec(r.getLong(2))}]").toSet
      assert(got == batchMatches, s"got=$got expected=$batchMatches")
    } finally q.stop()
  }
}
