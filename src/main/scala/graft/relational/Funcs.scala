package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.relational.Queries.cents

/** Scalar-function inventory: string / date-time / math / array / JSON.
  * All codegen'd built-ins (`org.apache.spark.sql.functions`) — no UDFs in
  * the hot path. Cross-engine determinism notes inline; doubles only ever
  * leave as exact integer-valued (cents/micros-quantized) results.
  */
object Funcs {

  /** upper/lower/substr/length/concat/LIKE/regexp_extract/trim/replace. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "part")
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_brand").as("lbrand"),
        substring($"p_type", 1, 5).as("t5"),
        length($"p_name").as("ln"),
        concat($"p_brand", lit("#"), $"p_type").as("bt"),
        when($"p_name".like("%a%"), 1).otherwise(0).as("has_a"),
        regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
        expr("replace(p_type, ' ', '_')").as("t_us"),
        trim(lit(" pad "), lit(" ")).as("trimmed"))
      .orderBy($"p_partkey")
  }

  /** year/quarter/month/day/weekday/date_trunc/datediff/epoch seconds. */
  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("d"),
        weekday($"o_orderdate").as("wd"), // 0 = Monday, matches DuckDB isodow-1
        date_trunc("month", $"o_orderdate").as("mstart"),
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).as("dd"),
        unix_timestamp($"o_orderdate").as("es"))
      .orderBy($"o_orderkey")
  }

  /** abs/ceil/floor/round/pmod/power/sign — exact-valued arithmetic only
    * (same input doubles → same integer/decimal results on both engines). */
  def mathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        abs(cents($"l_extendedprice") - lit(5000000L)).as("absdiff_cents"),
        ceil($"l_extendedprice").as("cp"),
        floor($"l_extendedprice").as("fp"),
        round($"l_extendedprice").cast(LongType).as("rp"),
        pmod($"l_orderkey", lit(7)).as("pm"),
        pow($"l_quantity", 2).cast(LongType).as("q2"),
        signum($"l_discount" - 0.05).cast("int").as("sg"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Array surface over embeddings: size / element_at / transform+aggregate
    * (element values quantized to integer micros — float output would depend
    * on engine float-printing; integer folds are order-independent). */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.table(s, dir, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").as("sz"),
        floor(element_at($"embedding", 1).cast("double") * 1000000L).cast(LongType).as("el1_micro"),
        aggregate(
          transform($"embedding", x => floor(x.cast("double") * 1000000L).cast(LongType)),
          lit(0L),
          (acc, x) => acc + x).as("sum_micro"))
      .orderBy($"vec_id")
  }

  /** JSON extraction (`props` = `{"k": <int>}`) + grouped aggregation. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> stringFuncs _,
    "q_date_funcs" -> dateFuncs _,
    "q_math_funcs" -> mathFuncs _,
    "q_array_funcs" -> arrayFuncs _,
    "q_json_funcs" -> jsonFuncs _,
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
        |  substr(p_type, 1, 5) AS t5, length(p_name) AS ln,
        |  concat(p_brand, '#', p_type) AS bt,
        |  CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  replace(p_type, ' ', '_') AS t_us,
        |  trim(' pad ', ' ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(date_part('isodow', o_orderdate) - 1 AS INT) AS wd,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS es
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(abs(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) - 5000000) AS BIGINT) AS absdiff_cents,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS cp,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fp,
        |  CAST(round(l_extendedprice) AS BIGINT) AS rp,
        |  l_orderkey % 7 AS pm,
        |  CAST(pow(l_quantity, 2) AS BIGINT) AS q2,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS sz,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS el1_micro,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS sum_micro
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
