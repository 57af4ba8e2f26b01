package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for the engine: every config an operator here
  * depends on, in one place. Users (and the reference's `env` setup,
  * `FlinkCEPExample.scala:46-47`) get event-time semantics, the
  * MATCH_RECOGNIZE parser, and the state-store provider the streaming CEP
  * operator requires, without hunting for flags.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // local-mode sizing: match cores, not the 200 default
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // UTC end to end (reference interprets event time as UTC,
      // FlinkCEPExample.scala:34)
      .config("spark.sql.session.timeZone", "UTC")
      // transformWithState (streaming CEP) needs multi-column-family state
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // MATCH_RECOGNIZE in spark.sql(...)
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
}
