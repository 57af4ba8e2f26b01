package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.EventPatterns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.3 appears as one entry in
  * [[queries]]; SQL-expressible ones carry a DuckDB oracle in [[oracleSql]]
  * with IDENTICAL output column names and a total ORDER BY (the driver sorts
  * columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core capability: CEP pattern matching (match + absence,
    * tagged output) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    EventPatterns.detect(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.Queries.all ++ pipeline.PipelineQueries.all ++
      Map[String, (SparkSession, String) => DataFrame](
        "q_cep_low_balance" -> ((s, dir) => EventPatterns.lowBalance(s, dir)),
        "q_cep_absence" -> ((s, dir) => EventPatterns.absence(s, dir)),
        "q_cep_funnel" -> ((s, dir) => EventPatterns.funnel(s, dir)),
        "q_cep_no_purchase" -> ((s, dir) => EventPatterns.noPurchase(s, dir)),
        "q_cep_until" -> ((s, dir) => EventPatterns.untilStreak(s, dir)),
      ) ++ sql.MrQueries.queries ++ operators.AsyncEnrich.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (CEP,
    * approximate, streaming-mode) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    relational.Queries.oracles ++ pipeline.PipelineQueries.oracles ++
      operators.AsyncEnrich.oracles
}
