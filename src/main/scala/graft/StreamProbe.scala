package graft

import org.apache.spark.sql.functions._

import graft.operators.EventPatterns
import graft.pattern.{AfterMatchSkip, Pattern}
import graft.ScaleProbe.Ev

/** Streaming-CEP throughput probe in its OWN JVM (manual; not part of the
  * driver contract). The r1-r3 probe ran inside [[ScaleProbe]]'s session,
  * where heap and GC pressure from the earlier batch probes swung the
  * number between 20k and 56k events/s run to run; isolated and preceded by
  * an untimed JIT warm-up pass, it is reproducible within ±15%.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamProbe [nEvents]"
  *
  * Drives the worst case deliberately: watermark 0 and
  * `processAllAvailable` after every micro-batch, so EVERY key with live
  * state round-trips the state store each batch.
  */
object StreamProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: org.apache.spark.sql.SparkSession =
      GraftSession.builder(s"local[$cpus]", cpus.toInt * 2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nStream = args.headOption.map(_.toLong).getOrElse(1000000L)
    val users = 100000L
    val pattern = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
      .where(_.kind == 0)
      .next("B").where(e => e.kind >= 1 && e.kind <= 6).oneOrMore.optional
      .next("C").where(_.kind == 7)
      .within(3600L * 1000L) // ms; tsFn converts micros->ms

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    /** Feed `events` in 4 micro-batches through transformWithState;
      * returns wall seconds and the match count. */
    def runEvents(name: String, events: Array[Ev]): (Double, Long) = {
      val mem = MemoryStream[Ev]
      val timed = mem.toDS()
        .withColumn("ets", timestamp_micros($"ts"))
        .withWatermark("ets", "0 seconds")
        .drop("ets").as[Ev]
      val out = graft.streaming.CepStream.matchPattern[Long, Ev, (Long, Long)](
        timed, _.user_id, _.ts / 1000L, pattern,
        (k, m) => Some((k, m.startTs)), (_, _) => None)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val batches = events.grouped(events.length / 4 + 1).toSeq
      val t0 = System.nanoTime()
      batches.foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      val nOut = spark.table(name).count()
      q.stop()
      (secs, nOut)
    }

    val uniform = ScaleProbe.syntheticEvents(spark, nStream, users).as[Ev].collect()
    // one key holds ~30% of rows — the streaming analog of the batch skew
    // probe: that key's state round-trips the store every micro-batch
    val skewed = ScaleProbe.syntheticEvents(spark, nStream, users)
      .withColumn("user_id",
        when(pmod(xxhash64($"event_id" * 19 + 3), lit(10L)) < 3, lit(0L))
          .otherwise($"user_id"))
      .as[Ev].collect()

    runEvents("warmup_cep",
      uniform.take(math.max(nStream / 10, 10000L).toInt)) // untimed: JIT + codegen
    // Three timed repetitions, MEDIAN reported: a single run still swings
    // ±40% with GC and RocksDB compaction phasing; the median of three is
    // stable across JVM invocations.
    def median3(tag: String, events: Array[Ev]): Unit = {
      val reps = (1 to 3).map { i =>
        System.gc()
        runEvents(s"${tag}_$i", events)
      }
      val (secs, nOut) = reps.sortBy(_._1)(Ordering.Double.TotalOrdering)(1)
      println(f"""{"probe":"$tag","rows":$nStream,"batches":4,"matches":$nOut,"secs":$secs%.1f,"rows_per_sec":${(nStream / secs).toLong},"reps_secs":[${reps.map(r => f"${r._1}%.1f").mkString(",")}]}""")
    }
    median3("cep_stream", uniform)
    median3("cep_stream_skew", skewed)
    spark.stop()
  }
}
