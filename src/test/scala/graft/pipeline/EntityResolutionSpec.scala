package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixture tests for the entity-resolution suite: a handcrafted dirty
  * registry with known match pairs, a transitive cluster whose weak pair
  * must be recovered by closure, an over-cap hot block the guard must
  * drop, and shuffled-input invariance.
  */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (rec_id, name, nation, bal, seg) */
  private def reg(rows: Seq[(Long, String, Int, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("rec_id", "name", "nation", "bal", "seg").repartition(4)
  }

  // Base registry: entity X as three records (two strong links to the base,
  // the A↔B pair scoring below threshold), entity Y as two records, plus an
  // unrelated record sharing Y's block that must NOT match.
  private val baseRows = Seq(
    (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),   // X base
    (2L, "Acme Xorp 0001", 7, 100.0, "BUILDING"),   // X: 1 sub, all agree = 56
    (3L, "Acme Cp 0001", 7, 100.0, "UNKNOWN"),      // X: dist 2 to base → 24+10+0+8 = 42 <50… see test
    (4L, "Beta LLC 0009", 3, 55.5, "MACHINERY"),    // Y base
    (5L, "Beta LLX 0009", 3, 55.5, "MACHINERY"),    // Y: 1 sub = 56
    (6L, "Zeta Inc 0009", 3, 900.0, "MACHINERY"),   // shares Y's blocks, dist > 2 → -15
  )

  test("assign: best master wins, ties to smallest id, no-match is NEW") {
    // master: entity 1 and its near-twin 2 (both distance 1 from the
    // incoming record 100 → tie on score → smaller id wins), plus an
    // unrelated 3; incoming 200 matches nothing (distance > 2)
    val master = reg(Seq(
      (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),
      (2L, "Acme Cori 0001", 7, 100.0, "BUILDING"),
      (3L, "Beta LLC 0009", 3, 55.5, "MACHINERY")))
    val incoming = reg(Seq(
      (100L, "Acme Corj 0001", 7, 100.0, "BUILDING"), // dist 1 to BOTH 1 & 2
      (200L, "Zzzz Xxxx 0009", 3, 900.0, "MACHINERY")))
    val got = EntityResolution.assignOf(incoming, master, 1000)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    assert(got(100L) == ((1L, 56, "MATCHED")), got.toString)
    assert(got(200L) == ((200L, 0, "NEW")), got.toString)
  }

  test("assign on the real registry: every corrupted arrival finds its base") {
    val got = EntityResolution.assign(spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rec, ent, status) = (r.getLong(0), r.getLong(1), r.getString(3))
      assert(status == "MATCHED", s"arrival $rec unmatched")
      // varA = base + 10^7, varB = base + 2*10^7 — each resolves to its base
      assert(ent == rec % 10000000L, s"arrival $rec → $ent")
    }
  }

  test("assign: live micro-batched arrivals == one batch assignment") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the scaladoc contract: live ingest runs the SAME plan per
    // micro-batch via foreachBatch against the master snapshot
    val master = reg(Seq(
      (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),
      (2L, "Beta LLC 0009", 3, 55.5, "MACHINERY"),
      (3L, "Gamma AG 0007", 5, 12.0, "AUTOMOBILE")))
    val arrivals = Seq(
      (100L, "Acme Xorp 0001", 7, 100.0, "BUILDING"),
      (101L, "Beta LLX 0009", 3, 55.5, "MACHINERY"),
      (102L, "Zzzz Qqqq 0005", 9, 1.0, "FURNITURE"),
      (103L, "Gamma AG 0007", 5, 12.0, "AUTOMOBILE"))
    val expect = EntityResolution.assignOf(
        reg(arrivals), master, 1000).collect().map(_.toString).toSet
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Int, Double, String)]
    val got = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    val q = mem.toDF()
      .toDF("rec_id", "name", "nation", "bal", "seg")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        EntityResolution.assignOf(b, master, 1000)
          .collect().foreach(r => got.add(r.toString))
        (): Unit
      }
      .outputMode("append").start()
    try {
      arrivals.grouped(2).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == expect, s"${got.asScala} vs $expect")
  }

  test("pairwise scoring: strong pairs match, weak and unrelated do not") {
    val m = EntityResolution.matchPairsOf(reg(baseRows), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m.contains((1L, 2L)) && m((1L, 2L)) == 56)
    assert(m.contains((4L, 5L)) && m((4L, 5L)) == 56)
    // dist(base, "Acme Cp 0001") = 2 (delete 'o','r'): 24+10+0+8 = 42 < 50
    assert(!m.contains((1L, 3L)))
    assert(!m.contains((2L, 3L)))
    // Zeta vs Beta: name distance > 2 → -15 dominates
    assert(!m.keySet.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("closure recovers the weak pair via a bridging record") {
    // Add a bridge record C at distance 1 from BOTH base (1) and the weak
    // record (3): 1↔7 and 3↔7 match, 1↔3 does not — the canonical table
    // must still place 1, 3, 7 in one entity.
    val rows = baseRows :+ (7L, "Acme Crp 0001", 7, 100.0, "BUILDING")
    val canon = EntityResolution.canonicalOf(reg(rows), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val x = canon.find(_._1 == 1L).get
    assert(x._2 == 4, s"entity 1 should have 4 members (1,2,3,7): $x")
    // survivorship: longest name ("Acme Corp 0001"/"Acme Xorp 0001"/"Acme
    // Crp 0001" are 14, 14, 13 chars; "Acme Cp 0001" is 12) → tie between
    // rec 1 and rec 2 broken by smallest rec_id → rec 1's name
    assert(x._3 == "Acme Corp 0001")
    assert(canon.exists(c => c._1 == 4L && c._2 == 2))
  }

  test("hot-block guard drops oversized blocks from pairing") {
    // 30 records all sharing both blocking keys (same nation, same seg,
    // same name suffix), each within distance 1 of a common stem — an
    // unguarded block yields C(30,2) pairs; cap 10 must yield zero.
    val hot = (100L until 130L).map(i =>
      (i, s"Stem ${('a' + (i % 26)).toChar} 7777", 5, 1.0, "BUILDING"))
    val guarded = EntityResolution.matchPairsOf(reg(hot), 10)
    assert(guarded.count() == 0)
    val unguarded = EntityResolution.matchPairsOf(reg(hot), 1000)
    assert(unguarded.count() > 0)
  }

  test("max_bal_cents quantizes exactly (612.40 → 61240, not 61239)") {
    // 612.40 * 100 = 61239.999… in binary; the +0.5-floor quantization must
    // land on 61240. Balance agreement is part of the score, so the pair
    // shares the value (differing balances score 42 < threshold by design —
    // the pairwise-scoring test pins that).
    val rows = Seq(
      (1L, "Acme Corp 0001", 7, 612.40, "BUILDING"),
      (2L, "Acme Xorp 0001", 7, 612.40, "BUILDING"))
    val c = EntityResolution.canonicalOf(reg(rows), 1000).collect()
    assert(c.length == 1)
    assert(c(0).getLong(3) == 61240L)
  }

  test("shuffled input produces identical matches") {
    val shuffled = new scala.util.Random(7).shuffle(baseRows)
    val a = EntityResolution.matchPairsOf(reg(baseRows), 1000)
      .orderBy("rec_a", "rec_b").collect().toSeq
    val b = EntityResolution.matchPairsOf(reg(shuffled), 1000)
      .orderBy("rec_a", "rec_b").collect().toSeq
    assert(a == b)
  }

  test("master merge == one-pass re-resolution over the union; untouched " +
    "entities byte-identical; NEW arrivals mint entities") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val master = reg(Seq(
      (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),
      (3L, "Beta LLC 0009", 3, 55.5, "MACHINERY"),
      (4L, "Gamma Co 0042", 9, 12.3, "FURNITURE"))) // untouched
    val incoming = reg(Seq(
      // dist-1 names with agreeing bal/nation/seg (score 56 ≥ 50); the
      // longer name at 100 wins the merged pick
      (100L, "Acme Corp X0001", 7, 100.0, "BUILDING"),
      (101L, "Acme Xorp 0001", 7, 100.0, "BUILDING"), // same entity 1
      (200L, "Zzzz Xxxx 0009", 3, 900.0, "MACHINERY"))) // NEW
    val merged = EntityResolution.masterMergeOf(incoming, master, 1000)
      .orderBy($"entity_id").collect().map(_.toString).toSeq
    // from-scratch twin: tag every record with its assigned entity, then
    // ONE survivorship aggregate over the whole union — the full re-pass
    // the combinable merge must equal
    val asg = EntityResolution.assignOf(incoming, master, 1000)
      .select($"rec_id", $"entity_id")
    val uni = master.select($"rec_id".as("entity_id"), $"rec_id", $"name", $"bal")
      .unionByName(incoming.join(asg, "rec_id")
        .select($"entity_id", $"rec_id", $"name", $"bal"))
    val full = uni.groupBy($"entity_id")
      .agg(count(lit(1)).as("n_members"),
        min(struct((-length($"name")).as("nl"), $"rec_id".as("ri"),
          $"name".as("nm"))).as("pick"),
        max(floor($"bal" * lit(100.0) + lit(0.5)).cast("long"))
          .as("max_bal_cents"))
      .select($"entity_id", $"n_members", $"pick.nm".as("canon_name"),
        $"pick.ri".as("canon_rec"), $"max_bal_cents")
      .orderBy($"entity_id").collect().map(_.toString).toSeq
    assert(merged == full, s"merge must equal full re-resolution:\n" +
      s"merged = $merged\nfull   = $full")
    // spot semantics: entity 1 grew to 3 members with the longer arrival
    // name surviving; untouched 4 is byte-identical to its master summary;
    // 200 minted NEW
    val byId = EntityResolution.masterMergeOf(incoming, master, 1000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3L && byId(1L).getString(2) == "Acme Corp X0001"
      && byId(1L).getLong(3) == 100L && byId(1L).getLong(4) == 10000L)
    assert(byId(4L).getLong(1) == 1L && byId(4L).getString(2) == "Gamma Co 0042"
      && byId(4L).getLong(4) == 1230L)
    assert(byId(200L).getLong(1) == 1L && byId(200L).getString(2) == "Zzzz Xxxx 0009")
  }

  test("master merge chains: a second batch folded into the merged summary " +
    "≡ one survivorship pass over the 3-way union; a batch2 match to a " +
    "batch1-minted entity updates it (r12 verdict #4)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val master = reg(Seq(
      (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),
      (3L, "Beta LLC 0009", 3, 55.5, "MACHINERY"),
      (4L, "Gamma Co 0042", 9, 12.3, "FURNITURE")))
    val batch1 = reg(Seq(
      (100L, "Acme Corp X0001", 7, 100.0, "BUILDING"), // MATCHED entity 1
      (200L, "Zzzz Xxxx 0009", 3, 900.0, "MACHINERY"))) // NEW → mints 200
    val batch2 = reg(Seq(
      (300L, "Acme Xorp 0001", 7, 100.0, "BUILDING"), // entity 1 again
      (301L, "Zzzz Xxxxx 0009", 3, 900.0, "MACHINERY"), // the MINTED 200
      (400L, "Qqqq Wwww 7777", 5, 10.0, "AUTOMOBILE"))) // NEW → mints 400
    def fin(s: org.apache.spark.sql.DataFrame): Seq[String] =
      s.select($"entity_id", $"n_members", $"pick.nm".as("canon_name"),
          $"pick.ri".as("canon_rec"), $"mbc".as("max_bal_cents"))
        .orderBy($"entity_id").collect().map(_.toString).toSeq
    // sequential path: fold batch1, then fold batch2 into THAT summary;
    // batch2 assigns against the merged master (base ∪ batch1 records,
    // matched records resolved through batch1's entity verdicts)
    val a1 = EntityResolution.assignOf(batch1, master, 1000)
      .select($"rec_id", $"entity_id", $"status")
    val s1 = EntityResolution.mergeIntoSummary(batch1,
      EntityResolution.masterSummaryOf(master), a1)
    val map1 = a1.select($"rec_id".as("eid_raw"), $"entity_id".as("eid"))
    val a2 = EntityResolution.assignOf(batch2, master.unionByName(batch1), 1000)
      .select($"rec_id", $"entity_id".as("eid_raw"), $"status")
      .join(map1, Seq("eid_raw"), "left")
      .select($"rec_id", coalesce($"eid", $"eid_raw").as("entity_id"),
        $"status")
    val s2 = EntityResolution.mergeIntoSummary(batch2, s1, a2)
    // from-scratch twin: tag all records with their entity, ONE aggregate
    val uni = master.select($"rec_id".as("entity_id"), $"rec_id", $"name", $"bal")
      .unionByName(batch1.join(a1.select($"rec_id", $"entity_id"), "rec_id")
        .select($"entity_id", $"rec_id", $"name", $"bal"))
      .unionByName(batch2.join(a2.select($"rec_id", $"entity_id"), "rec_id")
        .select($"entity_id", $"rec_id", $"name", $"bal"))
    val full = uni.groupBy($"entity_id")
      .agg(count(lit(1)).as("n_members"),
        min(struct((-length($"name")).as("nl"), $"rec_id".as("ri"),
          $"name".as("nm"))).as("pick"),
        max(floor($"bal" * lit(100.0) + lit(0.5)).cast("long")).as("mbc"))
    assert(fin(s2) == fin(full),
      s"chained merges must equal one pass over the 3-way union:\n" +
        s"chained = ${fin(s2)}\nfull    = ${fin(full)}")
    // the minted entity grew: batch2's 301 matched batch1's NEW 200, so
    // the merged summary shows 2 members with 301's longer name surviving
    val byId = s2.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(200L).getLong(1) == 2L &&
      byId(200L).getStruct(2).getString(2) == "Zzzz Xxxxx 0009",
      s"batch2 must update the batch1-minted entity: ${byId(200L)}")
    assert(byId(1L).getLong(1) == 3L, s"entity 1 grew across both batches")
    assert(byId(400L).getLong(1) == 1L, "batch2's NEW mints its entity")
  }

  test("mergeIntoSummary REJECTS an arrival aggregate whose non-NEW " +
    "entity_id is absent from the summary (forgotten verdict remap — " +
    "r13 ADVICE: it used to drop those arrivals silently)") {
    import spark.implicits._
    val master = reg(Seq(
      (1L, "Acme Corp 0001", 7, 100.0, "BUILDING"),
      (3L, "Beta LLC 0009", 3, 55.5, "MACHINERY")))
    val batch = reg(Seq((100L, "Acme Corp X0001", 7, 100.0, "BUILDING")))
    // a MATCHED verdict pointing at entity 999 — which no summary row has
    // (the shape a caller produces by skipping the prior-merge remap)
    val badAsg = Seq((100L, 999L, "MATCHED"))
      .toDF("rec_id", "entity_id", "status")
    val merged = EntityResolution.mergeIntoSummary(batch,
      EntityResolution.masterSummaryOf(master), badAsg)
    def msgs(t: Throwable): Iterator[String] =
      Iterator.unfold(Option(t))(_.map(x =>
        (Option(x.getMessage).getOrElse(""), Option(x.getCause))))
    val e = intercept[Exception] { merged.collect() }
    assert(msgs(e).exists(_.contains("absent from summary")),
      s"expected the orphan-arrival raise_error, got: $e")
    // the guard survives COLUMN PRUNING: a consumer that projects only
    // entity_id (the raise lives in a filter, not a prunable column) must
    // still raise instead of receiving a corrupt orphan row
    val e2 = intercept[Exception] {
      merged.select("entity_id").count()
    }
    assert(msgs(e2).exists(_.contains("absent from summary")),
      s"guard must survive column pruning, got: $e2")
    // and the healthy path is untouched: a correct assignment still merges
    val goodAsg = Seq((100L, 1L, "MATCHED")).toDF("rec_id", "entity_id", "status")
    val ok = EntityResolution.mergeIntoSummary(batch,
      EntityResolution.masterSummaryOf(master), goodAsg)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok(1L) == 2L && ok(3L) == 1L)
  }

  test("declared queries run on sf0.001 with plausible shape") {
    val dir = "/root/testdata/sf0.001"
    val m = EntityResolution.matches(spark, dir).collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getInt(2) >= EntityResolution.MatchThreshold))
    val c = EntityResolution.canonical(spark, dir).collect()
    assert(c.nonEmpty)
    // every cluster has ≥ 2 members and a canonical name from the registry
    assert(c.forall(_.getLong(1) >= 2))
  }
}
