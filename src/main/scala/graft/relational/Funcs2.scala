package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Second scalar/analytic function wave: bitwise ops, conditional functions,
  * date arithmetic, extended array ops, and distribution ranking functions
  * (percent_rank/cume_dist floored to basis points — identical IEEE division
  * of identical ints on both engines, floor makes the output integral).
  */
object Funcs2 {

  def bitwise(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .select(
        $"o_orderkey",
        ($"o_orderkey".bitwiseAND(255)).as("b_and"),
        ($"o_orderkey".bitwiseOR(4096)).as("b_or"),
        ($"o_orderkey".bitwiseXOR($"o_custkey")).as("b_xor"),
        shiftleft($"o_custkey", 3).as("b_shl"),
        shiftright($"o_orderkey", 2).as("b_shr"),
        bit_count($"o_orderkey").as("b_cnt"))
      .orderBy($"o_orderkey")
  }

  def conditional(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .select(
        $"o_orderkey",
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status2"),
        greatest($"o_orderkey" % 7, $"o_custkey" % 7).as("g7"),
        least($"o_orderkey" % 7, $"o_custkey" % 7).as("l7"),
        when($"o_totalprice" > 200000.0, lit("hi")).otherwise(lit("lo")).as("band"))
      .orderBy($"o_orderkey")
  }

  def dateArith(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .select(
        $"o_orderkey",
        date_add($"o_orderdate", 30).as("d_plus30"),
        add_months($"o_orderdate", 2).as("d_plus2m"),
        last_day($"o_orderdate").as("d_eom"),
        date_trunc("week", $"o_orderdate").as("d_week"))
      .orderBy($"o_orderkey")
  }

  def arrayOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "embeddings")
      .withColumn("q", transform($"embedding", x => floor(x.cast("double") * 1000L).cast("long")))
      .select(
        $"vec_id",
        element_at(sort_array($"q"), 1).as("mn"),
        element_at(sort_array($"q", asc = false), 1).as("mx"),
        when(array_contains($"q", 0L), 1).otherwise(0).as("has_zero"),
        aggregate(slice($"q", 1, 8), lit(0L), (a, x) => a + x).as("head8_sum"),
        size(array_distinct($"q")).as("n_distinct"))
      .orderBy($"vec_id")
  }

  def rankDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.table(s, dir, "customer")
      .select(
        $"c_mktsegment", $"c_custkey",
        floor(percent_rank().over(w) * 10000).cast("long").as("pr_bp"),
        floor(cume_dist().over(w) * 10000).cast("long").as("cd_bp"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** MapType surface: build a map per row (create_map), read it back via
    * map_keys cardinality + explode into (key, value) rows — the long form
    * is engine-portable while raw MAP output ordering is not. */
  def mapOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "nation")
      .select($"n_nationkey",
        map(
          lit("name"), $"n_name",
          lit("region"), $"n_regionkey".cast("string")).as("m"))
      .select($"n_nationkey", size(map_keys($"m")).as("n_keys"), explode($"m"))
      .select($"n_nationkey", $"n_keys", $"key".as("k"), $"value".as("v"))
      .orderBy($"n_nationkey", $"k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitwise_funcs" -> bitwise _,
    "q_cond_funcs" -> conditional _,
    "q_date_arith" -> dateArith _,
    "q_array_funcs2" -> arrayOps _,
    "q_window_dist" -> rankDist _,
    "q_map_funcs" -> mapOps _,
  )

  val oracles: Map[String, String] = Map(
    // the map is spelled long-form (UNION ALL) — portable ANSI; n_keys is
    // the map_keys cardinality (2 per construction)
    "q_map_funcs" ->
      """SELECT n_nationkey, 2 AS n_keys, k, v FROM (
        |  SELECT n_nationkey, 'name' AS k, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'region', CAST(n_regionkey AS VARCHAR) FROM nation)
        |ORDER BY n_nationkey, k""".stripMargin,
    "q_bitwise_funcs" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4096 AS b_or,
        |  xor(o_orderkey, o_custkey) AS b_xor,
        |  o_custkey << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS b_cnt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  greatest(o_orderkey % 7, o_custkey % 7) AS g7,
        |  least(o_orderkey % 7, o_custkey % 7) AS l7,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'hi' ELSE 'lo' END AS band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d_plus30,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS d_plus2m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS d_eom,
        |  date_trunc('week', o_orderdate) AS d_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_array_funcs2" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings)
        |SELECT vec_id,
        |  list_min(q) AS mn, list_max(q) AS mx,
        |  CASE WHEN list_contains(q, 0) THEN 1 ELSE 0 END AS has_zero,
        |  CAST(list_sum(q[1:8]) AS BIGINT) AS head8_sum,
        |  CAST(len(list_distinct(q)) AS INT) AS n_distinct
        |FROM e ORDER BY vec_id""".stripMargin,
    "q_window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pr_bp,
        |  CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cd_bp
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
  )
}
