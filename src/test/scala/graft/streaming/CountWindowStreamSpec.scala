package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import CountWindowStream._

/** Count-window streaming semantics: complete windows only, batch-boundary
  * invariance, and equality with the brute-force per-key chop when
  * event_ids are arrival-ordered (the batch `q_window_count` contract
  * restricted to complete windows).
  */
class CountWindowStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val N = 3
  // user 1: 7 events (2 complete windows, 1 pending); user 2: 6 (2 complete);
  // user 3: 2 (none)
  private val events =
    (1L to 7L).map(i => CwEvent(1L, 100L + i)) ++
      (1L to 6L).map(i => CwEvent(2L, 200L + i)) ++
      (1L to 2L).map(i => CwEvent(3L, 300L + i))

  /** Brute-force oracle: chop each user's event_id-ordered sequence. */
  private def expected: Set[CwWindow] =
    events.groupBy(_.user_id).flatMap { case (u, es) =>
      es.map(_.event_id).sorted.grouped(N).filter(_.size == N).zipWithIndex
        .map { case (w, i) => CwWindow(u, i.toLong, N.toLong, w.head, w.last) }
    }.toSet

  private def run(chunks: Seq[Seq[CwEvent]]): Set[CwWindow] = {
    import spark.implicits._
    val mem = MemoryStream[CwEvent]
    val q = CountWindowStream.windows(mem.toDS(), N).writeStream
      .format("memory").queryName("cw_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      spark.table("cw_out").as[CwWindow].collect().toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cw_out")
    }
  }

  test("complete windows emit; pending tails don't; invariant to batch slicing") {
    assert(expected.size == 4) // fixture sanity
    assert(run(Seq(events)) == expected)
    // interleaved users, windows spanning micro-batch boundaries
    assert(run(Seq(events.take(4), events.slice(4, 9), events.drop(9))) == expected)
    assert(run(events.map(Seq(_))) == expected)
  }

  test("state carries across batches: a window fed one event per batch") {
    val one = (1L to 3L).map(i => Seq(CwEvent(9L, i)))
    assert(run(one) == Set(CwWindow(9L, 0L, 3L, 1L, 3L)))
  }
}
