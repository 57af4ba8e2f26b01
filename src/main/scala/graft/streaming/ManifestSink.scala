package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once streaming PARQUET sink via per-epoch directories + an
  * atomic commit manifest — the streaming half of the reference's sink
  * contract (O13; the reference prints to stdout, a production job lands
  * files). Structured Streaming's `foreachBatch` gives at-least-once batch
  * delivery with a STABLE batch id across retries; exactly-once VISIBLE
  * output follows from making the write idempotent and the commit atomic:
  *
  *   - each epoch writes to its own `epoch=<id>` directory with
  *     `mode(overwrite)` — a retried epoch clobbers its own partial
  *     output, never another epoch's;
  *   - the manifest entry `_manifests/<id>` is created AFTER the data
  *     write, atomically (tmp + move) — readers list the manifest, so a
  *     torn write (data dir present, no manifest) is invisible;
  *   - a retry of an already-manifested epoch is skipped outright.
  *
  * This is the local-FS spelling of the standard object-store commit
  * protocol (write-data → atomic pointer flip); on S3/HDFS the move
  * becomes a conditional put / rename. [[readCommitted]] is the matching
  * reader: the union of exactly the manifested epochs.
  */
object ManifestSink {

  /** Attach the sink to a streaming DataFrame. */
  def start(df: DataFrame, outDir: String, checkpoint: String,
      queryName: String): StreamingQuery =
    df.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => writeEpoch(batch, outDir, id))
      .start()

  /** One epoch's idempotent write + atomic commit (also the unit the spec
    * drives directly to exercise retry/torn-write behavior). */
  def writeEpoch(batch: DataFrame, outDir: String, id: Long): Unit = {
    val manifest = manifestPath(outDir, id)
    if (Files.exists(manifest)) return // retried, already-committed epoch
    batch.write.mode("overwrite").parquet(s"$outDir/epoch=$id")
    Files.createDirectories(manifest.getParent)
    val tmp = manifest.getParent.resolve(s".$id.tmp")
    Files.writeString(tmp, s"$id\n")
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE)
  }

  private def manifestPath(outDir: String, id: Long): Path =
    Paths.get(outDir, "_manifests", id.toString)

  /** Read exactly the committed epochs (uncommitted/torn epoch dirs are
    * invisible). Throws when nothing has committed yet — a reader of a
    * sink that never produced is a pipeline-wiring error, not empty data. */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val mdir = Paths.get(outDir, "_manifests")
    val epochs: Seq[String] =
      if (!Files.exists(mdir)) Seq.empty
      else Using.resource(Files.list(mdir)) { s =>
        s.iterator().asScala
          .map(_.getFileName.toString)
          .filterNot(_.startsWith("."))
          .toSeq
      }
    if (epochs.isEmpty)
      throw new IllegalStateException(s"no committed epochs under $outDir")
    spark.read.parquet(epochs.map(e => s"$outDir/epoch=$e"): _*)
  }
}
