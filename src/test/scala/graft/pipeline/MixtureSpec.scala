package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Semantic properties of the corpus-composition operators (the oracle gate
  * pins exact values; these pin the SEMANTICS the values must obey).
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = {
    import spark.implicits._
    Tables.table(spark, sf, "documents")
      .select($"doc_id", $"source", $"n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  test("split partitions every document exactly once, ~80/10/10") {
    val rows = Mixture.split(spark, sf).collect()
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs === docs.length)
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // 500 docs at sf0.001: binomial(500, .8) is within ±10pp w.h.p.
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / totalDocs
    assert(trainFrac > 0.70 && trainFrac < 0.90, s"train frac $trainFrac")
    // char conservation: split char sums add up to the corpus total
    assert(rows.map(_.getLong(3)).sum === docs.map(_._3).sum)
  }

  test("mixture hits the per-source char budget in expectation and is deterministic") {
    val kept = Mixture.mixture(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nSources = docs.map(_._2).distinct.length
    val totalKeptChars = kept.map(_._3).sum.toDouble
    val target = Mixture.BudgetChars.toDouble * nSources
    // ~150k chars total at sf0.001, rate ~40%: expect within ±35% of target
    assert(totalKeptChars > 0.65 * target && totalKeptChars < 1.35 * target,
      s"kept $totalKeptChars vs target $target")
    // kept set is a subset of the corpus and reproducible
    val ids = kept.map(_._1).toSet
    assert(ids.subsetOf(docs.map(_._1).toSet))
    val again = Mixture.mixture(spark, sf).collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("quality gate threshold is the per-source lower median") {
    val rows = Mixture.qualityGate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    assert(rows.map(_._1).toSet === bySource.keySet)
    rows.foreach { case (src, threshold, nKept) =>
      val lens = bySource(src).map(_._3).sorted
      val median = lens((lens.length + 1) / 2 - 1) // lower median, 1-based rank (n+1)/2
      assert(threshold === median, s"$src threshold")
      assert(nKept === lens.count(_ >= median), s"$src kept count")
      assert(nKept >= lens.length / 2 && nKept <= lens.length)
    }
  }

  test("freqItems matches a brute-force per-source recount") {
    val got = TextAnalysis.freqItems(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    import spark.implicits._
    val texts = Tables.table(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val expected = texts.groupBy(_._1).flatMap { case (src, ds) =>
      val counts = ds.flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      counts.sortBy { case (w, c) => (-c, w) }.take(TextAnalysis.FreqK)
        .zipWithIndex.map { case ((w, c), i) => (src, w, c, i + 1) }
    }.toSet
    assert(got.toSet === expected)
  }

  test("leakfree split: near-dup cluster members always share a split") {
    val rows = Mixture.splitLeakfree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // covers the whole corpus exactly once
    assert(rows.map(_._1).sorted.toSeq === docs.map(_._1).sorted.toSeq)
    // the leakage property: one split per cluster
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length === 1, s"cluster $cid spans splits")
    }
    // the clustering itself must be the declared near-dup clustering
    val cc = Dedup.cluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.nonEmpty) // fixture corpus has planted near-dups
    rows.foreach { case (doc, cid, _) =>
      assert(cid === cc.getOrElse(doc, doc), s"doc $doc cluster")
    }
  }

  test("recipe composes gate, mixture, and split into consistent manifests") {
    val manifest = Mixture.recipe(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(manifest.nonEmpty)
    // every manifest row's source exists; splits are from the fixed set
    assert(manifest.map(_._1).toSet.subsetOf(docs.map(_._2).toSet))
    assert(manifest.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the recipe can never keep more than the gate's survivors
    val gateKept = Mixture.qualityGate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    manifest.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum <= gateKept(src), s"$src kept more than gated")
    }
  }

  test("temporal split: strict boundaries, embargo quarantine, no overlap") {
    val rows = Mixture.splitTemporal(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val cutSec = java.time.LocalDateTime
      .parse(Mixture.TemporalCutoff.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val testFrom = cutSec + Mixture.EmbargoHours * 3600L
    val bySplit = rows.groupBy(_._1)
    // all three buckets populated on the real table (events span Jan 2024)
    assert(bySplit.keySet == Set("train", "embargo", "test"), bySplit.keySet)
    // the non-overlap contract: train strictly below cutoff, embargo
    // inside [cutoff, cutoff+gap), test at/after cutoff+gap
    assert(bySplit("train").forall(_._5 < cutSec))
    assert(bySplit("embargo").forall(r => r._4 >= cutSec && r._5 < testFrom))
    assert(bySplit("test").forall(_._4 >= testFrom))
    // nothing silently dropped: bucket counts cover the table
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == n)
  }

  test("norm profile matches a driver-side exact recount") {
    import spark.implicits._
    val vecs = graft.sources.Tables.table(spark, sf, "embeddings")
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val sq = vecs.map { case (l, e) =>
      (l, e.map(x => math.floor(x.toDouble * 1000000L).toLong)
        .map(q => q * q).sum)
    }
    val exp = sq.groupBy(_._1).map { case (l, vs) =>
      val ns = vs.map(_._2)
      l -> (vs.size.toLong, ns.min, ns.max, ns.sum / vs.size,
        ns.count(_ < Embeddings.MinNormSq).toLong)
    }
    val got = Embeddings.normProfile(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == exp)
    // the random test vectors are healthy: no degenerate flags
    assert(got.values.forall(_._5 == 0L))
  }

  test("quantization error is bounded by one quantization step") {
    val rows = Embeddings.quantizeAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, maxErr, dims) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(dims === 64)
      // one int8 step is scale/127; truncating quant+dequant stays within it
      assert(maxErr <= scale / 127 + 1, s"vec ${r.getLong(0)}: $maxErr vs $scale")
    }
  }
}
