package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class StreamEv(ts: Timestamp, user: Long, kind: String)

/** Streaming relational surface: watermarked tumbling-window aggregation
  * (append-mode emission only after the watermark closes a window), late-data
  * drop, and streaming dedup via dropDuplicatesWithinWatermark.
  */
class StreamingRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private type E = StreamEv
  private val E = StreamEv
  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("tumbling window agg emits only watermark-closed windows; late rows dropped") {
    import spark.implicits._
    val input = MemoryStream[StreamEv]
    val agg = input.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"kind")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("wstart"), $"kind", $"cnt")
    val q = agg.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      input.addData(E(ts(1), 1, "a"), E(ts(4), 1, "a"), E(ts(11), 1, "b"))
      q.processAllAvailable()
      // watermark = 11:00 - 5m = 10:06 → window [10:00,10:10) not closed yet
      assert(spark.table("tumb").count() == 0)

      input.addData(E(ts(16), 2, "b"))
      q.processAllAvailable()
      // watermark = 10:11 → first window closes with cnt=2
      val r1 = spark.table("tumb").collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(r1 == Set(("a", 2L)))

      // a LATE event for the closed window (ts 10:03 < watermark) is dropped
      input.addData(E(ts(3), 9, "a"), E(ts(31), 1, "c"))
      q.processAllAvailable()
      val r2 = spark.table("tumb").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(r2.count(_._2 == "a") == 1) // still cnt=2, no second 'a' row
      assert(r2.exists(x => x._2 == "b" && x._3 == 2L)) // [10:10,10:20) closed with both b's
    } finally q.stop()
  }

  test("session window closes after gap + watermark passage") {
    import spark.implicits._
    val input = MemoryStream[StreamEv]
    val agg = input.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window($"ts", "10 minutes"), $"user")
      .agg(count(lit(1)).as("cnt"))
      .select($"user", $"session_window.start".as("sstart"), $"cnt")
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(E(ts(1), 1, "a"), E(ts(5), 1, "a"), E(ts(30), 1, "a"))
      q.processAllAvailable()
      input.addData(E(ts(50), 2, "a"))
      q.processAllAvailable()
      // first session [10:01,10:05] closed (gap to 10:30 > 10m, wm 10:45 past it)
      val r = spark.table("sess").collect().map(x => (x.getLong(0), x.getLong(2))).toSet
      assert(r.contains((1L, 2L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated keys inside the horizon") {
    import spark.implicits._
    val input = MemoryStream[StreamEv]
    val dedup = input.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user", "kind")
    val q = dedup.writeStream.format("memory").queryName("ddw")
      .outputMode("append").start()
    try {
      input.addData(E(ts(1), 1, "a"), E(ts(2), 1, "a"), E(ts(3), 2, "a"))
      q.processAllAvailable()
      input.addData(E(ts(4), 1, "a"), E(ts(5), 2, "b"))
      q.processAllAvailable()
      val out = spark.table("ddw").collect().map(r => (r.getLong(1), r.getString(2))).toSeq
      assert(out.sorted == Seq((1L, "a"), (2L, "a"), (2L, "b")))
    } finally q.stop()
  }
}
