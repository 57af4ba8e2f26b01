package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Source/sink formats beyond parquet: CSV and JSON roundtrips of the events
  * sample, schema preserved (S1-equivalent surface; parquet is exercised by
  * every declared query, in-memory by MemoryStream tests).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv and json roundtrips preserve rows and schema") {
    import spark.implicits._
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val n = src.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString

    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")

    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$dir/csv")
    val jsonBack = spark.read.schema(src.schema).json(s"$dir/json")

    assert(csvBack.count() == n && jsonBack.count() == n)
    assert(csvBack.schema == src.schema && jsonBack.schema == src.schema)
    // value-level agreement on a deterministic aggregate
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(
        org.apache.spark.sql.functions.sum($"event_id"),
        org.apache.spark.sql.functions.sum($"user_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(sig(csvBack) == sig(src) && sig(jsonBack) == sig(src))
  }
}
