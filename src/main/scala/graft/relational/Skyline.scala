package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SKYLINE (Pareto-dominance) query — Börzsönyi, Kossmann & Stocker, ICDE
  * 2001: the rows no other row dominates on every dimension at once. The
  * instance here is the per-user value-efficiency frontier over the events
  * stream: MAXIMIZE total purchase cents, MINIMIZE purchase count — a user
  * is dominated when someone extracts at least as much value in at most as
  * many purchases (strict on one side). Preference queries are a distinct
  * operator class: no single ORDER BY can express them (any weighting of
  * the two dimensions picks ONE frontier point; the skyline is the whole
  * frontier).
  *
  * Shape at scale — the 2-D sweep WITHOUT a global sort: a naive
  * `min() OVER (ORDER BY cents DESC)` is the single-partition window that
  * cannot scale, and the NOT-EXISTS self-join (the oracle's spelling) is
  * O(n²). Instead:
  *   1. collapse cents-ties to their best (minimum) count — one shuffle;
  *      only (cents, best-n) pairs can reach the frontier;
  *   2. value-range buckets `g = cents div BucketCents`: the strictly-
  *      higher-cents running minimum splits into an in-bucket window
  *      (per-bucket partition, never global) plus a cross-bucket carry,
  *      prefix-min'd HIERARCHICALLY over the bucket-minima table — the
  *      [[graft.pipeline.Curation.prefixOffsets]] pack machinery with min
  *      in place of sum, so the only single-partition stage touches at
  *      most `buckets / fanout^levels` rows, bounded by construction;
  *   3. a row survives iff nothing with strictly more cents has ≤ its
  *      count AND it matches its cents-group's best count.
  * The oracle cross-checks with the independent NOT-EXISTS spelling.
  */
object Skyline {

  /** Value-range bucket width (cents) for the sweep tiers. */
  val BucketCents = 10000L
  /** Tier fan-out — [[graft.pipeline.Curation.PackFanout]]'s role. */
  val Fanout = 4096

  def skyline(s: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.events(s, dir))

  /** [[skyline]] over any `(user_id, ts, event_type, value)` events table —
    * fixture entry point. */
  def skylineOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val agg = events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sum(floor($"value" * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_purchases"))
    frontier2d(agg)
  }

  /** The sweep over any `(user_id, cents, n_purchases)` table — maximize
    * `cents`, minimize `n_purchases`; fixture/property entry point. */
  private[relational] def frontier2d(agg: DataFrame): DataFrame = {
    val s = agg.sparkSession
    import s.implicits._
    // (1) per distinct cents value, the best (minimum) purchase count
    val best = agg.groupBy($"cents").agg(min($"n_purchases").as("bn"))
      .withColumn("g", expr(s"cents div $BucketCents"))
    // (2) strictly-higher-cents running min: in-bucket window + carry
    val inBucket = Window.partitionBy($"g").orderBy($"cents".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = best.withColumn("in_min", min($"bn").over(inBucket))
    val carries = suffixMins(
      best.groupBy($"g").agg(min($"bn").as("mn")), levels = 2)
    val frontier = withIn.join(carries, "g")
      // least() skips nulls; null = no strictly-higher-cents row at all
      .withColumn("min_higher", least($"in_min", $"carry"))
      .filter($"min_higher".isNull || $"min_higher" > $"bn")
      .select($"cents".as("f_cents"), $"bn".as("f_bn"))
    // (3) recover every user sitting on a frontier point
    agg.join(frontier,
        $"cents" === $"f_cents" && $"n_purchases" === $"f_bn")
      .select($"user_id", $"cents", $"n_purchases")
      .orderBy($"user_id")
  }

  /** Hierarchical EXCLUSIVE suffix-min over a `(g, mn)` bucket table:
    * `carry(g)` = min mn over all g' > g (null when none) — the
    * prefix-sum recursion with min as the combiner and descending order.
    * Each level shrinks the table by [[Fanout]]; the base single-partition
    * window sees ≤ buckets / fanout^levels rows. */
  private[relational] def suffixMins(
      buckets: DataFrame, levels: Int, fanout: Int = Fanout): DataFrame = {
    val s = buckets.sparkSession
    import s.implicits._
    if (levels == 0) {
      buckets
        .withColumn("carry", min($"mn").over(
          Window.orderBy($"g".desc).rowsBetween(Window.unboundedPreceding, -1)))
        .select($"g", $"carry")
    } else {
      val tiered = buckets.withColumn("sg", expr(s"g div $fanout"))
      val inSuper = Window.partitionBy($"sg").orderBy($"g".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withIn = tiered.withColumn("in_carry", min($"mn").over(inSuper))
      val superMins = tiered.groupBy($"sg").agg(min($"mn").as("mn"))
        .select($"sg".as("g"), $"mn")
      val superCarry = suffixMins(superMins, levels - 1, fanout)
        .select($"g".as("sg"), $"carry".as("sup_carry"))
      withIn.join(superCarry, "sg")
        .select($"g", least($"in_carry", $"sup_carry").as("carry"))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> skyline _,
  )

  val oracles: Map[String, String] = Map(
    // independent spelling: the O(n²) NOT-EXISTS dominance test — a true
    // cross-check of the sweep, not a re-derivation of it
    "q_skyline" ->
      """WITH agg AS (SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |    count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT user_id, cents, CAST(n_purchases AS BIGINT) AS n_purchases
        |FROM agg a
        |WHERE NOT EXISTS (SELECT 1 FROM agg b
        |  WHERE b.cents >= a.cents AND b.n_purchases <= a.n_purchases
        |    AND (b.cents > a.cents OR b.n_purchases < a.n_purchases))
        |ORDER BY user_id""".stripMargin,
  )
}
