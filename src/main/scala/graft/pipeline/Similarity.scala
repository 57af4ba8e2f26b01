package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import Hashing._

/** Approximate-nearest-neighbor search over the embeddings table — the scale
  * path beyond brute-force (relational TextSim.similarityCosine is the exact
  * baseline).
  *
  * Random-hyperplane LSH with DETERMINISTIC planes: plane p's component for
  * dimension d is ±1 by the parity of (p*31 + d) — reproducible in any
  * engine, no RNG. Bucket = 4 sign bits → 16 buckets; candidates are
  * same-bucket vectors; ranking is by exact integer dot product over
  * micro-quantized vectors (no float ties). At scale the bucket-join replaces
  * the O(n²) scan: each query probes |n|/2^planes candidates.
  */
object Similarity {

  val Planes = 4
  val QueryVecs = 5 // vec_id < 5 act as the query set

  /** LSH bucket id (0..15) for a quantized vector column. */
  def bucket(q: Column): Column =
    (0 until Planes).map { p =>
      when(
        aggregate(
          zip_with(q, sequence(lit(0), size(q) - 1),
            (x, d) => x * (pmod(lit(p * 31) + d, lit(2)) * 2 - 1)),
          lit(0L), (s, v) => s + v) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Top-3 same-bucket neighbors per query vector by exact quantized dot. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
      .withColumn("bkt", bucket($"q"))
    val queries = e.filter($"vec_id" < QueryVecs)
      .select($"vec_id".as("query_id"), $"q".as("qv"), $"bkt")
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
    queries.join(e, Seq("bkt"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", qdot($"qv", $"q").as("dot"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"query_id", $"rnk", $"vec_id")
      .orderBy($"query_id", $"rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_similarity_ann" -> annLsh _,
  )

  val oracles: Map[String, String] = Map(
    "q_similarity_ann" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
         |  FROM embeddings),
         |b AS (SELECT vec_id, q,
         |    CAST(list_sum(list_transform(generate_series(0, ${Planes - 1}), p ->
         |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
         |          d -> q[d] * (((p * 31 + d - 1) % 2) * 2 - 1))) > 0
         |        THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bkt
         |  FROM e),
         |cand AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM b qr JOIN b c ON qr.bkt = c.bkt AND qr.vec_id <> c.vec_id
         |  WHERE qr.vec_id < $QueryVecs)
         |SELECT query_id, rnk, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM cand) WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin,
  )
}
