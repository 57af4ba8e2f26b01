package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Hashing

/** The native pipeline expressions registered by [[GraftSqlExtensions]] must
  * be reachable from PURE SQL and agree exactly with the Column API — the
  * contract that lets a SQL-only user build the same dedup/fingerprint
  * pipelines.
  */
class GraftFunctionsSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def prepare(): Unit = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "streams of tokens flow through the pipeline"),
      (3L, "ab"),
    ).toDF("doc_id", "text").createOrReplaceTempView("fdocs")
    Seq(
      (1L, Seq(100L, -200L, 300L), Seq(1L, 2L, 3L)),
      (2L, Seq(0L, 0L, 7L), Seq(-1L, 5L, 9L)),
    ).toDF("id", "a", "b").createOrReplaceTempView("fvecs")
  }

  test("graft_charfold ≡ Column API (with and without seed)") {
    import spark.implicits._
    prepare()
    val sql = spark.sql(
      "SELECT doc_id, graft_charfold(text) AS fp, graft_charfold(text, 7) AS fp7 " +
        "FROM fdocs ORDER BY doc_id").as[(Long, Long, Long)].collect().toSeq
    val api = spark.table("fdocs")
      .select($"doc_id", Hashing.charFoldHash($"text").as("fp"),
        Hashing.charFoldHash($"text", 7L).as("fp7"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(sql == api)
  }

  test("graft_shingle_md5 + graft_rotminhash ≡ the Column minhash signature") {
    import spark.implicits._
    prepare()
    val sql = spark.sql(
      "SELECT doc_id, graft_rotminhash(graft_shingle_md5(split(text, ' ')), 8) AS sig " +
        "FROM fdocs ORDER BY doc_id").as[(Long, Seq[String])].collect().toSeq
    val api = spark.table("fdocs")
      .select($"doc_id",
        Hashing.minhashSigRot(Hashing.shingleMd5(org.apache.spark.sql.functions.split($"text", " ")), 8).as("sig"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(sql == api)
    assert(sql.head._2.length == 8)
  }

  test("graft_qdot and graft_simhash from SQL") {
    import spark.implicits._
    prepare()
    val dots = spark.sql("SELECT id, graft_qdot(a, b) AS d FROM fvecs ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    // 100*1 + (-200)*2 + 300*3 = 600; 0 + 0 + 63 = 63
    assert(dots == Seq(1L -> 600L, 2L -> 63L))
    val sim = spark.sql(
      "SELECT id, graft_simhash(a, 8) AS sh FROM fvecs ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    val api = spark.table("fvecs")
      .select($"id", Hashing.simhash($"a", 8).as("sh"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(sim == api)
  }

  test("non-literal parameter and bad arity produce clear errors") {
    prepare()
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_rotminhash(graft_shingle_md5(split(text, ' ')), doc_id) FROM fdocs").collect())
    assert(e1.getMessage.contains("integer literal"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_qdot(a) FROM fvecs").collect())
    assert(e2.getMessage.contains("arguments"), e2.getMessage)
  }
}
