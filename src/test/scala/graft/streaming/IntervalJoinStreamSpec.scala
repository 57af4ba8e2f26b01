package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class ErrRow(err_id: Long, user_id: Long, err_ts: Timestamp)
case class PurRow(pur_id: Long, u2: Long, pur_ts: Timestamp)

/** Streaming ≡ batch parity for the event-time interval join: the same
  * `IntervalJoinStream.join` lowered once over MemoryStreams (watermarked
  * stream-stream join, inputs staged across micro-batches and deliberately
  * out of key/time order) and once over batch frames (watermark eliminated →
  * plain range join). Inner stream-stream matches emit as they pair, so the
  * full pair set must appear without any end-of-stream flush.
  */
class IntervalJoinStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // well above epoch 0: the initial watermark is 0 and rows at-or-below it
  // are discarded as late before the join sees them
  private def ts(min: Long) = new Timestamp((600 + min) * 60000L)

  // 3 users; purchases at, inside, at-the-edge-of, and outside the 1-hour
  // window after each error; one purchase BEFORE its error (must not pair).
  private val errors = Seq(
    ErrRow(1L, 10L, ts(0)), ErrRow(2L, 10L, ts(90)),
    ErrRow(3L, 20L, ts(10)), ErrRow(4L, 30L, ts(5)))
  private val purchases = Seq(
    PurRow(101L, 10L, ts(0)),   // same instant as err 1 → pairs
    PurRow(102L, 10L, ts(60)),  // edge of err 1's window → pairs
    PurRow(103L, 10L, ts(61)),  // outside err 1, before err 2 → no pair
    PurRow(104L, 10L, ts(100)), // inside err 2's window → pairs
    PurRow(105L, 20L, ts(9)),   // before err 3 → no pair
    PurRow(106L, 20L, ts(69)),  // inside err 3's window → pairs
    PurRow(107L, 40L, ts(10)))  // key with no errors → no pair

  private def batchPairs: Set[(Long, Long)] = {
    import spark.implicits._
    IntervalJoinStream.join(errors.toDF(), purchases.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def streamPairs(
      errChunks: Seq[Seq[ErrRow]], purChunks: Seq[Seq[PurRow]]): Set[(Long, Long)] = {
    import spark.implicits._
    val em = MemoryStream[ErrRow]
    val pm = MemoryStream[PurRow]
    val q = IntervalJoinStream.join(em.toDF(), pm.toDF()).writeStream
      .format("memory").queryName("ivj_out").outputMode("append").start()
    try {
      errChunks.zipAll(purChunks, Seq.empty[ErrRow], Seq.empty[PurRow])
        .foreach { case (ec, pc) =>
          if (ec.nonEmpty) em.addData(ec: _*)
          if (pc.nonEmpty) pm.addData(pc: _*)
          q.processAllAvailable()
        }
      spark.table("ivj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivj_out")
    }
  }

  test("streaming interval join ≡ batch range join (out-of-order micro-batches)") {
    val expected = batchPairs
    // sanity on the fixture: pairs exist and the window actually excludes
    assert(expected == Set((1L, 101L), (1L, 102L), (2L, 104L), (3L, 106L)))
    val got = streamPairs(
      Seq(errors.take(1), errors.slice(1, 3), errors.drop(3)),
      Seq(purchases.take(3), purchases.slice(3, 5), purchases.drop(5)))
    assert(got == expected)
  }

  test("one-side-late arrival still pairs within the delay bound") {
    val expected = batchPairs
    // all purchases arrive first, errors trail in a later micro-batch —
    // the right-side buffer must hold them until the left catches up
    val got = streamPairs(
      Seq(Seq.empty, Seq.empty, errors),
      Seq(purchases.take(4), purchases.drop(4), Seq.empty))
    assert(got == expected)
  }
}
