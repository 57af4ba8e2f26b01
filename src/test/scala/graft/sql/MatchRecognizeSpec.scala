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
        "ORDER BY ts MEASURES PREV(A.x) AS p PATTERN (A) DEFINE A AS x > 1")
    }
    intercept[IllegalArgumentException] { // statement shape
      MatchRecognize.sql(spark, "SELECT id FROM t MATCH_RECOGNIZE (ORDER BY ts PATTERN (A))")
    }
  }

  test("MEASURES aggregates, CLASSIFIER() and MATCH_NUMBER()") {
    prepareView()
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM billing MATCH_RECOGNIZE (
        |  PARTITION BY id
        |  ORDER BY user_action_time
        |  MEASURES
        |    COUNT(B.*) AS n_b,
        |    SUM(B.balanceAfter) AS sum_b,
        |    AVG(B.balanceAfter) AS avg_b,
        |    MIN(B.balanceAfter) AS min_b,
        |    MAX(B.balanceAfter) AS max_b,
        |    CLASSIFIER() AS cls,
        |    MATCH_NUMBER() AS mno
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
        |  DEFINE
        |    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
        |    B AS B.balanceBefore >= B.balanceAfter,
        |    C AS C.balanceBefore < C.balanceAfter
        |)""".stripMargin).collect()
    assert(out.length == 1)
    val r = out.head
    // golden match on key 2: A=(11,6) B=(6,4) B=(4,3) C=(3,23)
    assert(r.getString(r.fieldIndex("id")) == "2")
    assert(r.getLong(r.fieldIndex("n_b")) == 2L)
    assert(r.getLong(r.fieldIndex("sum_b")) == 7L)
    assert(r.getDouble(r.fieldIndex("avg_b")) == 3.5)
    assert(r.getLong(r.fieldIndex("min_b")) == 3L)
    assert(r.getLong(r.fieldIndex("max_b")) == 4L)
    assert(r.getString(r.fieldIndex("cls")) == "C")
    assert(r.getLong(r.fieldIndex("mno")) == 1L)
  }

  test("MATCH_NUMBER() numbers matches sequentially within a partition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(
      ("1", "2020-05-01 10:00:00", 1L),
      ("1", "2020-05-01 10:01:00", 1L),
      ("1", "2020-05-01 10:02:00", 1L))
      .toDF("id", "datetime", "x")
      .withColumn("user_action_time", to_timestamp($"datetime"))
      .createOrReplaceTempView("mno_in")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mno_in MATCH_RECOGNIZE (
        |  PARTITION BY id
        |  ORDER BY user_action_time
        |  MEASURES MATCH_NUMBER() AS mno
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A)
        |  DEFINE A AS A.x = 1
        |)""".stripMargin)
      .collect().map(r => r.getLong(r.fieldIndex("mno"))).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("multi-column ORDER BY breaks timestamp ties deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("1", "2020-05-01 10:00:00", 1L, 1L),
      ("1", "2020-05-01 10:00:00", 2L, 2L),
      ("1", "2020-05-01 10:00:00", 3L, 3L))
    val stmt =
      """SELECT * FROM ties MATCH_RECOGNIZE (
        |  PARTITION BY id
        |  ORDER BY user_action_time, seq
        |  MEASURES FIRST(A.seq) AS a_seq, LAST(C.seq) AS c_seq
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B C)
        |  DEFINE A AS A.x = 1, B AS B.x = 2, C AS C.x = 3
        |)""".stripMargin
    val results = (0 until 3).map { i =>
      spark.createDataset(scala.util.Random.shuffle(rows))
        .toDF("id", "datetime", "seq", "x")
        .withColumn("user_action_time", to_timestamp($"datetime"))
        .repartition(2 + i)
        .createOrReplaceTempView("ties")
      MatchRecognize.sql(spark, stmt).collect().map(_.toSeq).toSeq
    }
    assert(results.head == Seq(Seq("1", 1L, 3L)))
    assert(results.distinct.size == 1)
  }

  test("AFTER MATCH SKIP TO FIRST/LAST variable parses to the DSL strategy") {
    val f = MatchRecognize.parseSpec(
      """ORDER BY ts AFTER MATCH SKIP TO FIRST B
        |PATTERN (A B+ C) DEFINE A AS x > 1""".stripMargin)
    assert(f.skip == graft.pattern.AfterMatchSkip.SkipToFirst("B"))
    val l = MatchRecognize.parseSpec(
      """ORDER BY ts AFTER MATCH SKIP TO LAST B
        |PATTERN (A B+ C) DEFINE A AS x > 1""".stripMargin)
    assert(l.skip == graft.pattern.AfterMatchSkip.SkipToLast("B"))
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
