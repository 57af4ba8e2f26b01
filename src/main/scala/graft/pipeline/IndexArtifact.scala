package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Shared manifest I/O for segment-based (LSM-style) index artifacts —
  * factored out of the MinHash index (r12) when the IVF index gained the
  * same artifact tier (r12 verdict #2), so the two can never drift on the
  * publish format:
  * {{{
  *   <root>/manifest     segment dirs, one per line
  *   <root>/segK/...     immutable segment payload (index-specific)
  *   <root>/...          index-specific metadata (hot list, centroids)
  * }}}
  * Manifest entries go through the Hadoop FileSystem of the artifact root,
  * so the artifact lives wherever the parquet does (HDFS/S3A/local — a
  * java.nio spelling would silently write a LOCAL `hdfs:` directory on the
  * driver). Segments under the artifact's own root are stored RELATIVE —
  * a fresh or compacted build is fully self-contained and relocatable;
  * segments a MERGE references in a foreign root stay absolute (qualified
  * URIs), so a merged artifact is relocatable only together with the roots
  * it references — the documented LSM trade.
  */
private[pipeline] object IndexArtifact {

  def writeManifest(s: SparkSession, out: String, segs: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(out, "manifest")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(new org.apache.hadoop.fs.Path(out)).toString
    val lines = segs.map { seg =>
      val q = fs.makeQualified(new org.apache.hadoop.fs.Path(seg)).toString
      if (q.startsWith(rootUri + "/")) q.substring(rootUri.length + 1) else q
    }
    val o = fs.create(p, true)
    try o.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally o.close()
  }

  /** Segment paths from `path/manifest`, relative entries resolved against
    * the artifact root. */
  def readManifest(s: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path, "manifest")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    new String(bytes, "UTF-8").split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { line =>
        if (line.contains("://") || line.startsWith("/")) line
        else new org.apache.hadoop.fs.Path(path, line).toString
      }
  }
}
