package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class Tick(ts: Timestamp, key: String, amount: Long)
case class KeyStats(key: String, n: Long, total: Long, distinctAmounts: Int, firstAmount: Long)

class StatsProcessor extends StatefulProcessor[String, Tick, KeyStats] {
    @transient private var count: ValueState[Long] = _
    @transient private var amounts: ListState[Long] = _
    @transient private var seen: MapState[Long, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      amounts = getHandle.getListState[Long]("amounts", Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getMapState[Long, Boolean]("seen",
        Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Tick], timerValues: TimerValues): Iterator[KeyStats] = {
      var n = if (count.exists()) count.get() else 0L
      rows.foreach { t =>
        n += 1
        amounts.appendValue(t.amount)
        seen.updateValue(t.amount, true)
      }
      count.update(n)
      // quiet-key timer: 10 min of event time past the current watermark
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 600000L)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String, timerValues: TimerValues, expired: ExpiredTimerInfo): Iterator[KeyStats] = {
      val all = amounts.get().toVector
      val out = KeyStats(key, count.get(), all.sum, seen.keys().size, all.headOption.getOrElse(0L))
      count.clear(); amounts.clear(); seen.clear()
      Iterator.single(out)
  }
}

/** The full keyed-state surface the reference's hand-rolled variant uses
  * (`FlinkProcessFunctionExample.scala:46-53` — ValueState slots + event-time
  * timer): ValueState, ListState, AND MapState through one StatefulProcessor,
  * with a timer emitting a summary when the key goes quiet. This pins the
  * API surface the CEP processor builds on.
  */
class StateSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: SQLContext = spark.sqlContext

  test("ValueState + ListState + MapState + event-time timer round-trip") {
    import spark.implicits._
    val input = MemoryStream[Tick]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val out = input.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .transformWithState(new StatsProcessor, TimeMode.EventTime(), OutputMode.Append())
    val q = out.writeStream.format("memory").queryName("stats")
      .outputMode("append").start()
    try {
      input.addData(Tick(ts(1), "a", 5), Tick(ts(2), "a", 7), Tick(ts(3), "a", 5))
      q.processAllAvailable()
      // advance the watermark far past the quiet timer with another key
      input.addData(Tick(ts(59), "z", 1))
      q.processAllAvailable()
      val r = spark.table("stats").as[KeyStats].collect().filter(_.key == "a")
      assert(r.toSeq == Seq(KeyStats("a", 3, 17, 2, 5)))
    } finally q.stop()
  }
}
