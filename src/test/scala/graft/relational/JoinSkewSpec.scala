package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted skew join: the manual hot-key split for a shuffle join whose key
  * has pathologically few values (SURVEY.md: "salting for skew"). The salt
  * must be invisible in the RESULT (pinned against the unsalted join here
  * and against the unsalted DuckDB oracle by the driver) while visibly
  * changing the PLAN: with broadcast off, the join's exchange must hash on
  * (key, salt) so each hot key spreads over [[Joins.SkewSalt]] partitions.
  */
class JoinSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join result == unsalted join result") {
    import spark.implicits._
    val got = Joins.skewSalted(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ev = graft.sources.Tables.table(spark, sf, "events")
    val cents = floor($"value" * lit(100.0) + lit(0.5)).cast("long")
    val dim = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("type_n"), sum(cents).as("type_cents"))
    val want = ev.select($"event_id", $"event_type", cents.as("c"))
      .join(dim, Seq("event_type"))
      .select($"event_id", $"event_type", $"type_n",
        ($"c" * $"type_n" - $"type_cents").as("dev"))
      .orderBy($"event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("with broadcast off, the exchange hashes on (key, salt)") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val savedAqe = conf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold", saved)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = Joins.skewSalted(spark, sf)
      df.count() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the equi-join keys must be the (event_type, salt) pair — one
      // exchange hashing on both columns, hot keys split SkewSalt ways
      val re = "hashpartitioning\\(event_type[^)]*salt".r
      assert(re.findFirstIn(plan).isDefined,
        s"expected an exchange on (event_type, salt):\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", savedAqe)
    }
  }

  test("skew diagnose: hot key flagged SALT, uniform keys OK") {
    import spark.implicits._
    // 90 rows over 4 keys: 'hot' carries 60 (share 6666 bp vs fair 2500 —
    // over the 2× line), the rest 10 each (1111 bp)
    val rows = (1 to 60).map(i => (i.toLong, "hot")) ++
      (for (k <- Seq("a", "b", "c"); i <- 1 to 10)
        yield ((1000 + i).toLong, k))
    val got = Joins.skewDiagnoseOf(rows.toDF("event_id", "event_type"))
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("a", 10L, 1111L, 2500L, "OK"),
      ("b", 10L, 1111L, 2500L, "OK"),
      ("c", 10L, 1111L, 2500L, "OK"),
      ("hot", 60L, 6666L, 2500L, "SALT")), got.toString)
  }

  test("skew diagnose: verdict stays honest past 10k keys (fair_bp floors to 0)") {
    import spark.implicits._
    // 15 000 keys: fair_bp = 10000 div 15000 = 0, so a ROUNDED comparison
    // (share_bp > 2·fair_bp) would flag every key with any measurable share.
    // 'warm' holds 2 rows = 2× the 1-row fair share exactly — NOT over the
    // 2× line, so the unrounded verdict must keep it OK (r9 ADVICE).
    val rows = (1 to 14999).map(i => (i.toLong, f"k$i%05d")) :+
      (20001L, "warm") :+ (20002L, "warm")
    val got = Joins.skewDiagnoseOf(rows.toDF("event_id", "event_type"))
    assert(got.filter($"action" === "SALT").count() == 0L)
    val warm = got.filter($"event_type" === "warm").collect().head
    assert(warm.getLong(1) == 2L && warm.getLong(3) == 0L) // n_rows, fair_bp
  }

  test("skew diagnose: a uniform key table raises no SALT verdict") {
    import spark.implicits._
    val rows = for (k <- Seq("a", "b", "c", "d"); i <- 1 to 25)
      yield (i.toLong, k)
    val got = Joins.skewDiagnoseOf(rows.toDF("event_id", "event_type"))
      .collect()
    assert(got.forall(_.getString(4) == "OK"))
    assert(got.forall(_.getLong(2) == 2500L))
  }
}
