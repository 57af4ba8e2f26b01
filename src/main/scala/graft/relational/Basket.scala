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
  * Shape at scale: ONE order-keyed shuffle collapses lineitem into sorted
  * basket arrays (the distinct folds into `collect_set`'s partial merge);
  * pair GENERATION is then map-side over the array — fan-out
  * C(items-per-order, 2), BOUNDED by basket size (TPC-H orders hold ≤ 7
  * lineitems → ≤ 21 pairs), never corpus-quadratic — the pair counts and
  * part frequencies are map-side-combinable shuffles over that bounded
  * fan-out, and the head is a TakeOrderedAndProject. The same plan at
  * 100 TB: basket size is a domain constant, so the pair table is a
  * constant multiple of the lineitem scan and no corpus-sized self-join
  * ever forms. */
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
    // ONE map-side-combinable shuffle folds the per-order DISTINCT into a
    // sorted basket ARRAY; every downstream input derives from it map-side.
    // This replaces the pre-r15 incidence spelling (distinct → Apriori
    // semi-join prefilter → o-keyed SELF-JOIN), which exchanged the
    // corpus-sized incidence three more times just to rediscover pairs the
    // basket array already holds: with baskets domain-bounded (TPC-H ≤ 7
    // items ⟹ ≤ 21 pairs), in-array pair GENERATION is O(1) per order and
    // the Apriori prune had no join input left to shrink — the support
    // gate lives on the pair-count HAVING, exactly answer-preserving.
    // cached: the basket table feeds pair generation AND the per-part
    // order-frequency count.
    val baskets = lineitem
      .groupBy($"l_orderkey".as("o"))
      .agg(array_sort(collect_set($"l_partkey")).as("ps"))
      .graftCache()
    val freq = baskets.select(explode($"ps").as("p"))
      .groupBy($"p").agg(count(lit(1)).as("c"))
    // sorted-array pair generation: (pos, p1) × the strictly-later slice —
    // distinctness and p1 < p2 are structural (collect_set + array_sort)
    val pairs = baskets
      .select($"ps", posexplode($"ps"))
      .select(col("col").as("p1"),
        explode(slice($"ps", col("pos") + lit(2), size($"ps"))).as("p2"))
      .groupBy($"p1", $"p2")
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
