package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MATERIALIZED VIEW of a keyed aggregate — Flink's dynamic
  * table / retract-stream materialization (`toRetractStream` →
  * upsert sink), the Table-API concept the reference's SQL example leans
  * on implicitly: a continuously-maintained queryable table, not an
  * append log.
  *
  * Structured Streaming's Update output mode emits exactly the CHANGED
  * aggregate rows per micro-batch (the compacted retract stream: the new
  * value subsumes the retraction). This sink upserts them into a
  * BUCKETED, VERSIONED parquet table:
  *
  *  - keys hash into [[Buckets]] fixed buckets; an epoch rewrites ONLY
  *    the buckets containing changed keys (per-epoch cost ∝ changed
  *    working set, never view size — the at-scale requirement; a 100 TB
  *    view with a hot 1% rewrites 1%);
  *  - each epoch writes its changed buckets under a fresh `v<epoch>`
  *    directory and publishes a MANIFEST (bucket → directory), then flips
  *    the `_current` pointer atomically — readers see a consistent
  *    whole-view snapshot, never a half-applied epoch (single-file MVCC,
  *    the Delta/Iceberg commit shape in miniature);
  *  - a retried epoch (foreachBatch redelivery) is detected by its
  *    already-published manifest and skipped — exactly-once visible
  *    state on at-least-once delivery, like [[ManifestSink]].
  *
  * [[readView]] is the matching reader: resolve `_current` → manifest →
  * per-bucket directories.
  */
object MaterializedView {

  val Buckets = 16

  /** Attach the view maintainer to an UPDATE-mode keyed aggregate. */
  def start(agg: DataFrame, keyCol: String, outDir: String,
      checkpoint: String, queryName: String): StreamingQuery =
    agg.writeStream
      .queryName(queryName)
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) =>
        upsert(batch, keyCol, outDir, id))
      .start()

  private def bucketOf(keyCol: String) =
    pmod(xxhash64(col(keyCol)), lit(Buckets.toLong))

  /** Apply one epoch's changed rows (also driven directly by the spec for
    * retry/consistency cases). Idempotent per epoch id. */
  def upsert(batch: DataFrame, keyCol: String, outDir: String, id: Long): Unit = {
    val spark = batch.sparkSession
    val versionFile = Paths.get(outDir, "_versions", id.toString)
    if (Files.exists(versionFile)) return // redelivered epoch
    // EAGER localCheckpoint severs the lineage to the streaming state
    // store: every downstream branch (bucket list, anti-join key set,
    // merged write) reads checkpointed blocks — re-planning through the
    // state-store scan from foreachBatch deadlocks RocksDB instance locks.
    val changed = batch.withColumn("__bucket", bucketOf(keyCol))
      .localCheckpoint(true)
    val changedBuckets = changed.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted // ≤ Buckets values — bounded
    val prev = currentManifest(outDir)
    if (changedBuckets.nonEmpty) {
      // previous content of ONLY the changed buckets, minus replaced keys
      val prevDirs = changedBuckets.flatMap(prev.get)
      val keep = if (prevDirs.isEmpty) None else Some(
        spark.read.parquet(prevDirs.map(d => s"$outDir/$d"): _*)
          .join(changed.select(keyCol).distinct(), Seq(keyCol), "left_anti")
          .withColumn("__bucket", bucketOf(keyCol)))
      val merged = keep.map(_.unionByName(changed)).getOrElse(changed)
      merged.write.partitionBy("__bucket").mode("overwrite")
        .parquet(s"$outDir/v$id")
    }
    val manifest = prev ++
      changedBuckets.map(b => b -> s"v$id/__bucket=$b").toMap
    Files.createDirectories(versionFile.getParent)
    val body = manifest.toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b $d" }.mkString("", "\n", "\n")
    val tmp = versionFile.getParent.resolve(s".$id.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE)
    val curTmp = Paths.get(outDir, s"._current.$id.tmp")
    Files.writeString(curTmp, id.toString)
    Files.move(curTmp, Paths.get(outDir, "_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def currentManifest(outDir: String): Map[Long, String] = {
    val cur = Paths.get(outDir, "_current")
    if (!Files.exists(cur)) Map.empty
    else {
      val id = Files.readString(cur).trim
      Files.readAllLines(Paths.get(outDir, "_versions", id)).asScala
        .filter(_.nonEmpty)
        .map { line =>
          val Array(b, d) = line.split(" ", 2)
          b.toLong -> d
        }.toMap
    }
  }

  /** Drop version directories no longer referenced by the CURRENT
    * manifest — the storage-reclaim half of MVCC (run it after a grace
    * period in production so in-flight readers of older snapshots finish;
    * the manifest flip itself never blocks on vacuum). Returns the deleted
    * version dir names. */
  def vacuum(outDir: String): Seq[String] = {
    val live: Set[String] =
      currentManifest(outDir).values.map(_.split("/", 2)(0)).toSet
    val root = new java.io.File(outDir)
    val dead = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        !live.contains(f.getName))
    dead.foreach(deleteRec)
    dead.map(_.getName).toSeq.sorted
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** The view as of the last committed epoch — one consistent snapshot. */
  def readView(spark: SparkSession, outDir: String): DataFrame = {
    val m = currentManifest(outDir)
    if (m.isEmpty)
      throw new IllegalStateException(s"no committed view under $outDir")
    spark.read.parquet(m.values.map(d => s"$outDir/$d").toSeq: _*)
  }

  /** TIME TRAVEL: the view exactly as of epoch `id` — every published
    * manifest is itself a complete bucket→dir snapshot, so any historical
    * epoch is readable until [[vacuum]] reclaims the versions it
    * references (the Delta/Iceberg `VERSION AS OF` contract in miniature). */
  def readViewAt(spark: SparkSession, outDir: String, id: Long): DataFrame = {
    val vf = Paths.get(outDir, "_versions", id.toString)
    if (!Files.exists(vf))
      throw new IllegalStateException(s"epoch $id was never committed under $outDir")
    val m = Files.readAllLines(vf).asScala.filter(_.nonEmpty).map { line =>
      val Array(_, d) = line.split(" ", 2)
      d
    }
    spark.read.parquet(m.map(d => s"$outDir/$d").toSeq: _*)
  }
}
