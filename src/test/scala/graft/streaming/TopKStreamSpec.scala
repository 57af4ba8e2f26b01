package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import TopKStream._

/** SpaceSaving guarantees pinned against exact batch counts: heavy items
  * always present, estimates bracket the truth from above, exact when the
  * shard's distinct items fit the slot budget — across micro-batch
  * slicings (SpaceSaving is order-sensitive only below the guarantee
  * threshold, so the spec asserts guarantees, not slot-for-slot equality).
  */
class TopKStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Skewed fixture: token t0 is heavy (40%), t1 medium (20%), the rest
    * a long tail of 60 singletons-to-few — far more distinct items than
    * the 16 slots, so eviction churn is exercised. One shard. */
  private val items: Vector[TItem] = {
    val toks =
      Vector.fill(80)("t0") ++ Vector.fill(40)("t1") ++ Vector.fill(20)("t2") ++
        (0 until 60).flatMap(i => Vector.fill(1 + i % 2)(s"z$i"))
    toks.zipWithIndex.map { case (t, i) => TItem(0L, i.toLong, t) }.toVector
  }
  private lazy val exact: Map[String, Long] =
    items.groupBy(_.item).view.mapValues(_.size.toLong).toMap
  private lazy val nTotal = items.size.toLong

  /** Final (latest-emission) estimate per item after streaming `chunks`. */
  private def run(name: String, chunks: Seq[Seq[TItem]]): Map[String, (Long, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[TItem]
    val q = TopKStream.topk(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      spark.table(name).as[TEst].collect()
        .zipWithIndex
        .groupBy(_._1.item)
        .map { case (it, rs) =>
          val last = rs.maxBy(_._2)._1 // latest emission wins
          it -> (last.est, last.err)
        }
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  private def checkGuarantees(got: Map[String, (Long, Long)]): Unit = {
    val threshold = nTotal / Slots
    // every item with true count > n/m is in the summary
    exact.filter(_._2 > threshold).keys.foreach(it =>
      assert(got.contains(it), s"heavy item $it missing (threshold $threshold)"))
    // overestimate-only, bracketed by the tracked error
    got.foreach { case (it, (est, err)) =>
      val truth = exact.getOrElse(it, 0L)
      assert(est >= truth, s"$it est $est < true $truth")
      assert(est - err <= truth, s"$it est-err ${est - err} > true $truth")
    }
  }

  test("guarantees hold, one batch") {
    checkGuarantees(run("topk_one", Seq(items)))
  }

  test("guarantees hold across micro-batch slicings") {
    checkGuarantees(run("topk_four", items.grouped(items.size / 4 + 1).toSeq))
    checkGuarantees(run("topk_each", items.grouped(7).toSeq))
  }

  test("exact when distinct items fit the slot budget") {
    val small = items.filter(r => Set("t0", "t1", "t2")(r.item))
      .zipWithIndex.map { case (r, i) => r.copy(seq = i.toLong) }
    val got = run("topk_small", small.grouped(30).toSeq)
    val truth = small.groupBy(_.item).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == truth, got.toString)
    assert(got.values.forall(_._2 == 0L), got.toString)
  }

  test("restart from checkpoint preserves counters and slot assignments") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val ckpt = java.nio.file.Files.createTempDirectory("topk_ckpt").toString
    val mem = MemoryStream[TItem]
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[TEst]())
    def start() = TopKStream.topk(mem.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TEst], _: Long) =>
        b.collect().foreach(got.add)
        (): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val (h1, h2) = items.splitAt(items.size / 2)
    val q1 = start()
    try { mem.addData(h1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { mem.addData(h2); q2.processAllAvailable() } finally q2.stop()
    // final estimate per item across both runs must satisfy the same
    // whole-stream guarantees — only possible if (n, slots) survived
    val fin = got.asScala.zipWithIndex.groupBy(_._1.item)
      .map { case (it, rs) => val l = rs.maxBy(_._2)._1; it -> (l.est, l.err) }
    checkGuarantees(fin)
    // and the heavy item's count is exact across the restart (t0 is never
    // evicted: its estimate only grows; exactness requires continuity)
    assert(fin("t0")._1 == exact("t0"), fin("t0").toString)
  }

  test("mergeTopK folds shard emission logs into a bounded global top-k") {
    import spark.implicits._
    // honest sharding: every occurrence of one item lands on hash-chosen
    // shard (3 shards), seq preserves arrival order within each shard
    val sharded = items.zipWithIndex.map { case (r, i) =>
      r.copy(shard = (math.abs(r.item.hashCode) % 3).toLong, seq = i.toLong)
    }
    val mem = MemoryStream[TItem]
    val q = TopKStream.topk(mem.toDS())
      .writeStream.format("memory").queryName("topk_merge").outputMode("append").start()
    try {
      // multiple micro-batches so the emission log holds STALE rows per
      // item — exactly what the max-(est, err) fold must see through
      sharded.grouped(sharded.size / 3 + 1).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      val merged = TopKStream.mergeTopK(spark.table("topk_merge").as[TEst], 10)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(merged.length == 10)
      assert(merged.map(_._1).toSeq == (1 to 10), merged.mkString(", "))
      // bounds bracket the exact global counts on every merged row, and
      // guaranteed_min is exactly est - err
      merged.foreach { case (_, it, est, err, gmin) =>
        val truth = exact.getOrElse(it, 0L)
        assert(est >= truth && est - err <= truth, s"$it: ($est, $err) vs $truth")
        assert(gmin == est - err)
      }
      // the true heavy head appears in order at the top (each is heavy
      // within its own shard, so presence + overestimate-only rank them)
      assert(merged.take(3).map(_._2).toSeq == Seq("t0", "t1", "t2"),
        merged.take(3).mkString(", "))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS topk_merge")
    }
  }

  test("shards are independent: same items on two shards, same summaries") {
    val two = items ++ items.map(r => r.copy(shard = 1L, seq = r.seq + 100000L))
    import spark.implicits._
    val mem = MemoryStream[TItem]
    val q = TopKStream.topk(mem.toDS())
      .writeStream.format("memory").queryName("topk_shards").outputMode("append").start()
    try {
      mem.addData(two)
      q.processAllAvailable()
      val rows = spark.table("topk_shards").as[TEst].collect()
      val s0 = rows.filter(_.shard == 0L).map(r => (r.item, r.est, r.err)).toSet
      val s1 = rows.filter(_.shard == 1L).map(r => (r.item, r.est, r.err)).toSet
      assert(s0 == s1)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS topk_shards")
    }
  }
}
