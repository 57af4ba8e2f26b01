package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming incremental entity assignment: per-batch replay of the batch
  * operator against a static master is SLICING-INVARIANT (the scoring is
  * record-local given the master — no cross-arrival state), so the union
  * of per-batch verdicts must equal one batch run over all arrivals,
  * under any micro-batch slicing, on the REAL corrupted registry.
  */
class EntityAssignStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-batch verdicts == one batch run, on the real registry at sf0.001") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cust = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "customer")
    val full = graft.pipeline.EntityResolution.registryOf(cust)
    val master = full.filter($"rec_id" >= 10000000L).cache()
    val incoming = full.filter($"rec_id" < 10000000L)
      .as[(Long, String, Int, Double, String)].collect().toIndexedSeq

    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val mem = MemoryStream[(Long, String, Int, Double, String)]
    val q = EntityAssignStream.start(
      mem.toDF().toDF("rec_id", "name", "nation", "bal", "seg"),
      master, graft.pipeline.EntityResolution.MaxBlock) { (batch, _) =>
      got ++= batch.collect().map(_.toSeq)
    }
    // deliberately uneven slicing: 3 batches of very different sizes
    val cuts = Seq(incoming.take(7), incoming.slice(7, 100), incoming.drop(100))
    cuts.filter(_.nonEmpty).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()

    val want = graft.pipeline.EntityResolution.assignOf(
        full.filter($"rec_id" < 10000000L), master,
        graft.pipeline.EntityResolution.MaxBlock)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSet == want.toSet,
      s"streaming ${got.size} rows vs batch ${want.length}")
    master.unpersist(blocking = false)
  }

  test("a NEW arrival with no master candidate keeps its own id") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val master = Seq((10000001L, "Acme Corp 0001", 7, 100.0, "BUILDING"))
      .toDF("rec_id", "name", "nation", "bal", "seg")
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[(Long, String, Int, Double, String)]
    val q = EntityAssignStream.start(
      mem.toDF().toDF("rec_id", "name", "nation", "bal", "seg"),
      master, graft.pipeline.EntityResolution.MaxBlock) { (b, _) =>
      got ++= b.collect()
    }
    mem.addData(Seq(
      (5L, "Acme Xorp 0001", 7, 100.0, "BUILDING"),    // 1 sub → MATCHED
      (6L, "Totally Other 9999", 3, 1.0, "MACHINERY"))) // no block overlap
    q.processAllAvailable(); q.stop()
    val byId = got.map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(byId(5L) == ((10000001L, "MATCHED")))
    assert(byId(6L) == ((6L, "NEW")))
  }
}
