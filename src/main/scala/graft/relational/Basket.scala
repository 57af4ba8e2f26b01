package graft.relational

import graft.Caches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — frequent-itemset pair mining (the support
  * counting at the core of Apriori/FP-growth, Agrawal & Srikant 1994) over
  * the order/lineitem star: part pairs bought together in the same order,
  * with pair support and each part's own order frequency (the inputs to
  * confidence/lift — kept as raw integer counts so the ranking stays
  * engine-exact; any lift ordering is the [[graft.pipeline.TextAnalysis]]
  * collocations cross-multiplication applied to these columns).
  *
  * Shape at scale: distinct (order, part) — one shuffle — then the
  * WITHIN-ORDER self-join: candidate fan-out is C(items-per-order, 2),
  * BOUNDED by basket size (TPC-H orders hold ≤ 7 lineitems → ≤ 21 pairs),
  * never corpus-quadratic; the pair counts are one more map-side-
  * combinable shuffle, and the head is a TakeOrderedAndProject. The same
  * plan at 100 TB: basket size is a domain constant, so the pair table is
  * a constant multiple of the lineitem scan. */
object Basket {

  /** Minimum pair support and ranking cutoff. */
  val BasketMinSupport = 2
  val BasketTopK = 50

  def basketPairs(s: SparkSession, dir: String): DataFrame =
    basketPairsOf(s.read.parquet(s"$dir/lineitem.parquet"))

  /** [[basketPairs]] over any table with `l_orderkey`/`l_partkey` columns —
    * fixture entry point. */
  def basketPairsOf(lineitem: DataFrame): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    // cached: the distinct (order, part) incidence feeds the frequency
    // count, the support prefilter, and (via hot) both self-join sides —
    // uncached the lineitem scan + distinct shuffle replays 4×
    val li = lineitem
      .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
      .distinct()
      .graftCache()
    val freq = li.groupBy($"p").agg(count(lit(1)).as("c"))
    // Apriori pruning: pair support ≤ min(c1, c2), so parts in fewer than
    // MinSupport orders can never reach the gate — drop their postings
    // BEFORE the self-join (the candidate-generation monotonicity that
    // makes Apriori tractable; on a long-tail catalog this removes most
    // of the join input, and it is exactly answer-preserving).
    val hot = li.join(
      freq.filter($"c" >= BasketMinSupport).select($"p"), Seq("p"), "left_semi")
    val pairs = hot.as("a").join(hot.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter($"pair_cnt" >= BasketMinSupport)
    pairs
      .join(freq.select($"p".as("p1"), $"c".as("c1")), "p1")
      .join(freq.select($"p".as("p2"), $"c".as("c2")), "p2")
      .select($"p1", $"p2", $"pair_cnt", $"c1", $"c2")
      .orderBy($"pair_cnt".desc, $"p1", $"p2")
      .limit(BasketTopK)
      .orderBy($"pair_cnt".desc, $"p1", $"p2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_basket_pairs" -> basketPairs _,
  )

  val oracles: Map[String, String] = Map(
    "q_basket_pairs" ->
      s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
         |  GROUP BY 1, 2),
         |freq AS (SELECT p, count(*) AS c FROM li GROUP BY p),
         |pr AS (SELECT a.p AS p1, b.p AS p2, count(*) AS pair_cnt
         |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= $BasketMinSupport)
         |SELECT pr.p1, pr.p2, CAST(pair_cnt AS BIGINT) AS pair_cnt,
         |  CAST(f1.c AS BIGINT) AS c1, CAST(f2.c AS BIGINT) AS c2
         |FROM pr JOIN freq f1 ON f1.p = pr.p1 JOIN freq f2 ON f2.p = pr.p2
         |ORDER BY pair_cnt DESC, p1, p2 LIMIT $BasketTopK""".stripMargin,
  )
}
