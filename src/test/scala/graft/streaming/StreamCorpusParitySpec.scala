package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The four per-key streaming statistics (EWMA, CUSUM, TWA, transitions)
  * replayed over the DRIVER'S events corpus (sf0.001) in micro-batch
  * chunks must land exactly on their batch queries' results — fixtures
  * prove the semantics, this proves them on real data shapes (ns
  * timestamps, ties, 15 users × irregular series).
  */
class StreamCorpusParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val SfDir = "/root/testdata/sf0.001"

  // event-time-ordered corpus rows, collected once (sf0.001 is tiny)
  private lazy val corpus: Seq[(Long, Timestamp, String, Double, Long)] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, SfDir)
      .select($"user_id", $"ts", $"event_type", $"value", $"event_id")
      .as[(Long, Timestamp, String, Double, Long)]
      // the processors' ordering contract is (second-truncated ts,
      // event_id) — sub-second ms order could contradict the id tiebreak
      .collect().toSeq.sortBy(e => (e._2.getTime / 1000L, e._5))
  }

  /** Replays the corpus through `f` in ~7 chunks and returns the sink
    * rows as strings. */
  private def replay(name: String, f: DataFrame => org.apache.spark.sql.Dataset[_])
      : Seq[String] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Double, Long)]
    val q = f(mem.toDF().toDF("user_id", "ts", "event_type", "value", "event_id"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      corpus.grouped((corpus.size / 7).max(1)).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      spark.table(name).collect().map(_.mkString("|")).toSeq
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("EwmaStream on the driver corpus: final emissions == q_ts_ewma") {
    import spark.implicits._
    val batch = graft.relational.TimeSeries.ewma(spark, SfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => s"${r._1}|${r._2}|${r._3}|${r._4}").toSet
    assert(batch.nonEmpty)
    val last = replay("par_ewma", EwmaStream.levels)
      .map(_.split('|')).groupBy(_(0)).values
      .map(_.maxBy(_(1).toLong).mkString("|")).toSet
    assert(last == batch)
  }

  test("CusumStream on the driver corpus: final emissions == q_ts_cusum") {
    import spark.implicits._
    val batch = graft.relational.TimeSeries.cusum(spark, SfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => s"${r._1}|${r._2}|${r._3}|${r._4}|${r._5}").toSet
    assert(batch.nonEmpty)
    val last = replay("par_cusum", CusumStream.monitor)
      .map(_.split('|')).groupBy(_(0)).values
      .map(_.maxBy(_(1).toLong).mkString("|")).toSet
    assert(last == batch)
  }

  test("TwaStream on the driver corpus: final emissions == q_ts_twa") {
    import spark.implicits._
    val batch = graft.relational.TimeSeries.twa(spark, SfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => s"${r._1}|${r._2}|${r._3}|${r._4}").toSet
    assert(batch.nonEmpty)
    val last = replay("par_twa", TwaStream.levels)
      .map(_.split('|')).groupBy(_(0)).values
      .map(_.maxBy(_(1).toLong).mkString("|")).toSet
    assert(last == batch)
  }

  test("TransitionStream on the driver corpus: pair counts == q_path_transitions") {
    import spark.implicits._
    val batch = graft.relational.Paths.transitions(spark, SfDir)
      .select($"src", $"dst", $"cnt")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(batch.nonEmpty)
    val streamed = replay("par_trans",
        (df: DataFrame) => TransitionStream.transitions(df))
      .map(_.split('|')).groupBy(a => (a(1), a(2)))
      .view.mapValues(_.size.toLong).toMap
    assert(streamed == batch)
  }
}
