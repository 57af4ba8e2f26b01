package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The sharded training-output sink: balanced deterministic shards, each
  * file a disjoint contiguous shuffle-key range, rows sorted within.
  */
class ShardSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val Shards = 8

  test("sharded write: N files, disjoint sorted key ranges, lossless, deterministic") {
    import spark.implicits._
    val docs = Tables.table(spark, sf, "documents")
      .select($"doc_id", $"source", $"n_chars")
    val out = Files.createTempDirectory("graft-shards").toString
    Curation.shardedWrite(docs, out, Shards)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(files.length === Shards)

    // lossless: every doc lands in exactly one shard
    val keysPerFile = files.map { f =>
      spark.read.parquet(f).select($"shuffle_key", $"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(keysPerFile.map(_.length).sum === docs.count())
    // within-file order is the shuffle-key order
    keysPerFile.foreach { ks =>
      assert(ks.map(_._1).toSeq === ks.map(_._1).sorted.toSeq)
    }
    // across files the key ranges are disjoint (range partitioning), so the
    // file order IS the global shuffle order
    val nonEmpty = keysPerFile.filter(_.nonEmpty)
    // part-file name order matches range order up to empty shards
    val ordered = nonEmpty.sortBy(_.head._1)
    ordered.sliding(2).foreach {
      case Array(a, b) => assert(a.last._1 <= b.head._1, "overlapping shard ranges")
      case _           =>
    }
    // balance: no shard hogs the corpus (salted-hash keys spread uniformly)
    val sizes = keysPerFile.map(_.length)
    assert(sizes.max <= sizes.sum / Shards * 3, sizes.mkString(","))

    // deterministic: a second write lays out identical shards
    val out2 = Files.createTempDirectory("graft-shards2").toString
    Curation.shardedWrite(docs, out2, Shards)
    val files2 = new java.io.File(out2).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    val again = files2.map { f =>
      spark.read.parquet(f).select($"shuffle_key", $"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(again.map(_.toSeq).toSeq === keysPerFile.map(_.toSeq).toSeq)
  }
}
