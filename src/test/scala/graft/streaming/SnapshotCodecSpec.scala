package graft.streaming

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.events.BillingEvent
import graft.pattern.NFA.{Consumed, Partial, Snapshot}

/** Round-trips the compact snapshot codec against structurally-shared
  * partials (the branching NFA's normal state shape) and measures that it
  * beats Java serialization on size — the property the streaming state
  * round-trip cost rides on.
  */
class SnapshotCodecSpec extends AnyFunSuite {
  // Encoder derivation needs an active session even though the codec itself
  // never touches it at encode/decode time.
  private lazy val spark = TestSpark.spark

  private def ev(id: String, ts: String, before: Long, after: Long) =
    BillingEvent(id, ts, before, after)

  private def sampleSnapshot: Snapshot[BillingEvent] = {
    val e0 = ev("1", "2020-05-01 11:00:00", 13, 9)
    val e1 = ev("1", "2020-05-01 11:10:00", 9, 7)
    val e2 = ev("1", "2020-05-01 11:20:00", 7, 5)
    // Two branches sharing e0/e1 (same idx ⇒ same event), one singleton.
    Snapshot(
      List(
        Partial(1, 2, List(Consumed(1, 2L, e2), Consumed(1, 1L, e1), Consumed(0, 0L, e0)), 0L, 1000L),
        Partial(2, 0, List(Consumed(1, 1L, e1), Consumed(0, 0L, e0)), 0L, 1000L),
        Partial(0, 1, List(Consumed(0, 2L, e2)), 2L, 3000L)),
      minStartIdx = 0L,
      nextIdx = 3L)
  }

  test("encode/decode round-trips partials, indices, and shared events") {
    spark // force session init for encoder resolution
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val s = sampleSnapshot
    val back = codec.decode(codec.encode(s))
    assert(back == s)
    // e2 appears under two different consuming stages (branch divergence):
    // dedup is by idx, stage tags must survive independently.
    assert(back.partials(0).consumed.head.stage == 1)
    assert(back.partials(2).consumed.head.stage == 0)
  }

  test("champion (deferred maximal match) round-trips with shared events") {
    spark
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val base = sampleSnapshot
    // champion shares e0/e1 with the live partials (normal trailing-loop
    // shape: the champion IS an earlier completion of the same attempt)
    val s = base.copy(champion =
      Some((base.partials(1).copy(stage = 1, taken = 2), 4321L)))
    assert(codec.decode(codec.encode(s)) == s)
  }

  test("graph-mode state round-trips: derivation ranks and deferred matches") {
    spark
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val base = sampleSnapshot
    val ranked = base.partials.map(p =>
      p.copy(ranks = Vector.tabulate(p.consumed.size)(_ % 3)))
    val s = base.copy(
      partials = ranked,
      deferred = List((ranked(1), 7777L), (ranked(2), 8888L)))
    val back = codec.decode(codec.encode(s))
    assert(back == s)
    assert(back.partials(0).ranks == Vector(0, 1, 2))
    assert(back.deferred.map(_._2) == List(7777L, 8888L))
  }

  test("physical-history ring round-trips") {
    spark
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val s = sampleSnapshot.copy(history = List(
      ev("9", "2020-05-01 10:00:00", 20, 20),
      ev("9", "2020-05-01 10:10:00", 20, 15)))
    assert(codec.decode(codec.encode(s)) == s)
  }

  test("empty snapshot round-trips") {
    spark
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val s = Snapshot[BillingEvent](Nil, 5L, 17L)
    assert(codec.decode(codec.encode(s)) == s)
  }

  test("compact codec is materially smaller than Java serialization") {
    spark
    val codec = new SnapshotCodec[BillingEvent](Encoders.product[BillingEvent])
    val s = sampleSnapshot
    val compact = codec.encode(s).length
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(s)
    out.close()
    val javaLen = bos.toByteArray.length
    // 2.9× on this 3-event fixture; the gap widens with event count since
    // Java serialization pays per-object reflective overhead.
    assert(compact * 2 <= javaLen, s"compact=$compact java=$javaLen")
  }
}
