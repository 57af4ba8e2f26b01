package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference's SQL MATCH_RECOGNIZE query (FlinkSqlMatchRecognizeExample
  * .scala:50-68) runs verbatim (modulo rowtime-attribute naming) through our
  * parser extension and reproduces the golden match fixture.
  */
class MatchRecognizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def prepareView(): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = getClass.getResource("/input-data.csv").getPath
    spark.read.textFile(input)
      .map(graft.events.BillingEvent.parse)
      .withColumn("user_action_time", to_timestamp($"datetime", "yyyy-MM-dd HH:mm:ss"))
      .createOrReplaceTempView("billing")
  }

  private val statement =
    """SELECT * FROM billing MATCH_RECOGNIZE (
      |  PARTITION BY id
      |  ORDER BY user_action_time
      |  MEASURES
      |    A.datetime AS alarmTriggerDatetime,
      |    C.datetime AS topupDatetime
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP PAST LAST ROW
      |  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
      |  DEFINE
      |    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
      |    B AS B.balanceBefore >= B.balanceAfter,
      |    C AS C.balanceBefore < C.balanceAfter
      |)""".stripMargin

  test("golden MATCH_RECOGNIZE via the library API") {
    prepareView()
    val out = MatchRecognize.sql(spark, statement)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("2", "2020-05-01 11:00:00", "2020-05-01 11:40:00")))
  }

  test("golden MATCH_RECOGNIZE via spark.sql with the injected parser") {
    prepareView()
    val out = spark.sql(statement)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("2", "2020-05-01 11:00:00", "2020-05-01 11:40:00")))
  }

  test("ordinary SQL still parses through the delegate") {
    prepareView()
    assert(spark.sql("SELECT count(*) AS n FROM billing").collect().head.getLong(0) == 7L)
  }

  test("ALL ROWS PER MATCH emits every consumed row with CLASSIFIER") {
    prepareView()
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM billing MATCH_RECOGNIZE (
        |  PARTITION BY id
        |  ORDER BY user_action_time
        |  MEASURES A.datetime AS alarmDt
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
        |  DEFINE
        |    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
        |    B AS B.balanceBefore >= B.balanceAfter,
        |    C AS C.balanceBefore < C.balanceAfter
        |)""".stripMargin)
      .collect()
      .map(r => (r.getString(r.fieldIndex("id")), r.getString(r.fieldIndex("datetime")),
        r.getString(r.fieldIndex("classifier")), r.getString(r.fieldIndex("alarmDt"))))
      .toSeq
    // the golden match consumed 4 rows of key 2: A, B, B, C
    assert(out == Seq(
      ("2", "2020-05-01 11:00:00", "A", "2020-05-01 11:00:00"),
      ("2", "2020-05-01 11:15:00", "B", "2020-05-01 11:00:00"),
      ("2", "2020-05-01 11:30:00", "B", "2020-05-01 11:00:00"),
      ("2", "2020-05-01 11:40:00", "C", "2020-05-01 11:00:00")))
  }

  test("FIRST/LAST navigation in DEFINE lowers to an iterative condition") {
    prepareView()
    def q(navCond: String) = MatchRecognize.sql(spark,
      s"""SELECT * FROM billing MATCH_RECOGNIZE (
         |  PARTITION BY id
         |  ORDER BY user_action_time
         |  MEASURES A.datetime AS alarmDt, C.datetime AS topupDt
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
         |  DEFINE
         |    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
         |    B AS B.balanceBefore >= B.balanceAfter,
         |    C AS C.balanceBefore < C.balanceAfter AND $navCond
         |)""".stripMargin).collect()
    // golden C has balanceAfter 23; first A's balanceBefore is 11
    assert(q("C.balanceAfter > FIRST(A.balanceBefore)").length == 1)
    assert(q("C.balanceAfter > FIRST(A.balanceBefore)").head.getString(2) == "2020-05-01 11:40:00")
    assert(q("C.balanceAfter < FIRST(A.balanceBefore)").isEmpty)
    assert(q("C.balanceAfter >= LAST(B.balanceAfter)").length == 1) // 23 >= 3
  }

  test("malformed clauses fail with clear errors, not silent misparses") {
    intercept[IllegalArgumentException] { // no ORDER BY
      MatchRecognize.parseSpec("PARTITION BY id PATTERN (A) DEFINE A AS x > 1")
    }
    intercept[IllegalArgumentException] { // no PATTERN
      MatchRecognize.parseSpec("PARTITION BY id ORDER BY ts DEFINE A AS x > 1")
    }
    intercept[IllegalArgumentException] { // unsupported measure shape
      MatchRecognize.parseSpec(
        "ORDER BY ts MEASURES sum(A.x) AS s PATTERN (A) DEFINE A AS x > 1")
    }
    intercept[IllegalArgumentException] { // statement shape
      MatchRecognize.sql(spark, "SELECT id FROM t MATCH_RECOGNIZE (ORDER BY ts PATTERN (A))")
    }
  }

  test("TO NEXT ROW skip + quantifier variants parse") {
    prepareView()
    val spec = MatchRecognize.parseSpec(
      """PARTITION BY id ORDER BY user_action_time
        |MEASURES A.datetime AS a ONE ROW PER MATCH
        |AFTER MATCH SKIP TO NEXT ROW
        |PATTERN (A B+ C?) WITHIN INTERVAL '30' MINUTE
        |DEFINE A AS balanceBefore >= 10""".stripMargin)
    assert(spec.skip == graft.pattern.AfterMatchSkip.SkipToNext)
    assert(spec.pattern == Seq(("A", ' '), ("B", '+'), ("C", '?')))
    assert(spec.withinMs.contains(1800000L))
  }
}
