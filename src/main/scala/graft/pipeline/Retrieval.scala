package graft.pipeline

import graft.Caches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** Lexical retrieval and index-quality audit — the "find the docs worth
  * keeping / check the index before trusting it" pair every large-corpus
  * pipeline runs:
  *
  *  - [[bm25]]: Okapi BM25 ranking (Robertson & Walker '94) for a fixed
  *    query, in the inverted-index shape: ONLY the query terms' postings
  *    ever shuffle (the term filter sits before the aggregation, pushdown-
  *    friendly), document lengths are one narrow projection, corpus stats
  *    one tiny aggregate, and the final top-k is a global
  *    `TakeOrderedAndProject` — no corpus-sized sort. At 100 TB this is the
  *    standard quality-mining scan: score every document against a topic
  *    query, keep the head.
  *  - [[annRecall]]: recall@k of the LSH multiprobe index
  *    ([[Similarity.annLsh]]) against the exact brute-force top-k — the
  *    measure-your-index step that decides plane count / probe radius
  *    BEFORE a 100 TB build. Query-set-sized work: queries broadcast against
  *    the corpus for the exact baseline; the ANN side reuses the production
  *    plan unchanged.
  *
  * Determinism: the one float op in BM25 (`ln` of an exact integer ratio —
  * the idf takes ≤ |query| distinct values) is floor-quantized to micros
  * immediately; every other step is exact integer (the k1/b saturation term
  * is cleared to a common integer denominator), per the oracle rules.
  */
object Retrieval {

  /** Fixed topic query: one rare discriminative term + two common ones. */
  val QueryTerms = Seq("dup", "vector", "merge")
  /** BM25 k1 (term-frequency saturation), in centi-units: 1.2. */
  val K1Centi = 120L
  /** BM25 b (length normalization), in centi-units: 0.75. */
  val BCenti = 75L
  /** Result head size. */
  val TopK = 20

  /** BM25 scores for [[QueryTerms]], top [[TopK]] documents.
    *
    * Integer spelling of the per-term contribution (num and den of the
    * saturation fraction multiplied by `10000·avgdl` to clear k1/b):
    * {{{
    *   idf_micro = floor(ln((2N+2)/(2·df+1)) · 1e6)    // == ln((N-df+.5)/(df+.5)+1)
    *   c = idf_micro · tf · (k1c+100) · 100 · avgdl
    *       div (tf·10000·avgdl + k1c·(100-bc)·avgdl + k1c·bc·dl)
    * }}}
    * `avgdl` is the floor integer mean doc length. Magnitudes stay < 2^50
    * at any realistic tf/dl, far from the int64 cliff. */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bm25Scored(s, dir).orderBy($"score_micro".desc, $"doc_id").limit(TopK)
  }

  /** The full BM25-scored document table `(doc_id, score_micro, n_terms)`
    * (no head cut) — shared by [[bm25]] and the [[rrf]] lexical arm. */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.table(s, dir, "documents")
      .select($"doc_id", tokens(lower($"text")).as("w"))
    val dl = docs.select($"doc_id", size($"w").cast("long").as("dl"))
    // corpus stats: one map-side-combinable aggregate, 1 row
    val stats = dl.agg(count(lit(1)).as("n"),
      expr("sum(dl) div count(1)").as("avgdl"))
    // inverted-index shape: only query-term postings reach the shuffle
    val tf = docs
      .select($"doc_id", explode($"w").as("term"))
      .filter($"term".isInCollection(QueryTerms))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // document frequency per query term: ≤ |query| rows
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        floor(log((lit(2L) * $"n" + 2L).cast("double") / (lit(2L) * $"df" + 1L))
          * 1e6).cast("long"))
      .withColumn("c",
        expr(s"""(idf_micro * tf * ${K1Centi + 100L} * 100 * avgdl) div
                |(tf * 10000 * avgdl + $K1Centi * ${100L - BCenti} * avgdl
                | + $K1Centi * $BCenti * dl)""".stripMargin.replace("\n", " ")))
    scored.groupBy($"doc_id")
      .agg(sum($"c").as("score_micro"), count(lit(1)).as("n_terms"))
  }

  /** RRF constant k (Cormack, Clarke & Buettcher, SIGIR '09): 60, the
    * published default. */
  val RrfK = 60L
  /** Depth of each ranker's candidate pool — ranks beyond this contribute
    * < 1/(60+100) and are cut, which is what makes the fusion scale-safe
    * (each arm reduces to a global top-k, never a corpus-sized ranking). */
  val RrfPool = 100
  /** Fused head size. */
  val RrfTop = 20
  /** Query vector for the dense arm: the corpus vector with this id (the
    * vec_id↔doc_id alignment of the test tables; in production the query
    * embedding arrives from the encoder). */
  val DenseQueryVec = 0L

  /** HYBRID retrieval — Reciprocal Rank Fusion of the lexical BM25 ranking
    * and a dense cosine ranking, the standard two-tower retrieval merge
    * (RAG stacks, quality mining with a seed document):
    * `rrf = Σ_arms 1e6 div (k + rank)`, exact integer, docs missing from
    * an arm's pool contribute 0.
    *
    * Shape at scale: each arm is `row_number` over a GLOBAL order followed
    * by `rank ≤ [[RrfPool]]` — Catalyst's LimitPushdownThroughWindow turns
    * exactly this into a TakeOrderedAndProject (no corpus-sized sort, no
    * SinglePartition exchange; the window runs over the already-cut pool).
    * The fusion is then a full-outer join of two ≤[[RrfPool]]-row tables —
    * driver-trivial at any corpus size. The dense arm broadcasts the 1-row
    * query vector (BNLJ allowlisted); the lexical arm reuses the [[bm25]]
    * inverted-index shape unchanged. */
  def rrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lexW = Window.orderBy($"score_micro".desc, $"doc_id")
    val lex = bm25Scored(s, dir)
      .withColumn("r_lex", row_number().over(lexW))
      .filter($"r_lex" <= RrfPool)
      .select($"doc_id", $"r_lex")
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
    val qv = e.filter($"vec_id" === DenseQueryVec)
      .select($"q".as("qv"))
    val denW = Window.orderBy($"dot".desc, $"doc_id")
    val den = e.filter($"vec_id" =!= DenseQueryVec)
      .crossJoin(broadcast(qv))
      .select($"vec_id".as("doc_id"), qdot($"qv", $"q").as("dot"))
      .withColumn("r_den", row_number().over(denW))
      .filter($"r_den" <= RrfPool)
      .select($"doc_id", $"r_den")
    lex.join(den, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        (coalesce(expr(s"1000000 div ($RrfK + r_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + r_den)"), lit(0L))).as("rrf_micro"),
        coalesce($"r_lex", lit(0)).cast("long").as("r_lex"),
        coalesce($"r_den", lit(0)).cast("long").as("r_den"))
      .orderBy($"rrf_micro".desc, $"doc_id")
      .limit(RrfTop)
  }

  /** Neighbors compared per query (must equal the k of the ANN plan). */
  val RecallK = 3

  /** Recall@k of the LSH multiprobe index against exact brute force, per
    * query vector, in basis points ([[RecallK]] denominator). The exact
    * baseline broadcasts the query set (tiny) against the corpus — one
    * narrow pass + a per-query top-k window over query-set-bounded groups;
    * the ANN side is the UNMODIFIED production plan, so the audit measures
    * what actually ships. */
  def annRecall(s: SparkSession, dir: String): DataFrame =
    recallAgainst(s, dir, Similarity.annLsh(s, dir))

  /** The same recall@k audit for the IVF nprobe index ([[Similarity
    * .annIvfProbe]]) — re-measured whenever the probe count changes (the
    * nprobe=4 change landed without a recall number; this pins it into the
    * round artifacts). */
  def annRecallIvf(s: SparkSession, dir: String): DataFrame =
    recallAgainst(s, dir, Similarity.annIvfProbe(s, dir))

  /** recall@[[RecallK]] of any `(query_id, vec_id)` ANN result against the
    * exact brute-force top-k (query set broadcast, one narrow corpus pass). */
  private def recallAgainst(s: SparkSession, dir: String, annPlan: DataFrame): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
    val queries = e.filter($"vec_id" < Similarity.QueryVecs)
      .select($"vec_id".as("query_id"), $"q".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
    val exact = e.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", qdot($"qv", $"q").as("dot"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= RecallK)
      .select($"query_id", $"vec_id")
    val ann = annPlan.select($"query_id", $"vec_id")
    val hits = exact.join(ann, Seq("query_id", "vec_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("h"))
    // zero-recall queries must SHOW UP in the audit, not vanish
    queries.select($"query_id")
      .join(hits, Seq("query_id"), "left")
      .select($"query_id", coalesce($"h", lit(0L)).as("n_hit"),
        expr(s"(coalesce(h, 0L) * 10000) div $RecallK").as("recall_bp"))
      .orderBy($"query_id")
  }

  /** Recall@k of the PQ asymmetric-dot search over the COMPRESSED index
    * ([[Embeddings.annPq]]) — the third audited index family, measuring
    * what 64× compression costs against the same exact baseline. */
  def annRecallPq(s: SparkSession, dir: String): DataFrame =
    recallAgainst(s, dir, Embeddings.annPq(s, dir))

  /** Recall@[[RecallK]] of the GUARDED all-N kNN similarity join
    * ([[Similarity.knnJoin]] — the plan a 100 TB curation run leans on
    * hardest) against exact brute force, per query vector: the fourth
    * audited index family, measuring what nprobe=[[Similarity.IvfNprobe]]
    * cell probing costs when EVERY vector is a query.
    *
    * AUDIT-SCALE-ONLY by design: the exact baseline is the full N×N dot
    * table (one broadcast of the corpus against itself — sound only while
    * the corpus side fits a broadcast), because an indexed "truth" would
    * beg the question the audit asks. At 100 TB, run it on a uniform
    * vector sample ([[Sampling]]) — recall is a mean over queries, so a
    * sample estimates it with standard-error guarantees a full run can't
    * beat for the cost. The input-size require makes the contract
    * explicit instead of a silent foot-gun. */
  def annRecallKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
      .graftCache() // three branches: query universe, both brute-force sides
    require(e.count() <= MaxRecallVecs,
      s"annRecallKnn's exact baseline is N² — audit-scale only " +
        s"(≤ $MaxRecallVecs vectors); run it on a sample at corpus scale")
    val w = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
    val exact = e
      .crossJoin(broadcast(e.select($"vec_id".as("query_id"), $"q".as("qv"))))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", qdot($"qv", $"q").as("dot"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= RecallK)
      .select($"query_id", $"vec_id")
    val ann = Similarity.knnJoin(s, dir).select($"query_id", $"vec_id")
    val hits = exact.join(ann, Seq("query_id", "vec_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("h"))
    e.select($"vec_id".as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id", coalesce($"h", lit(0L)).as("n_hit"),
        expr(s"(coalesce(h, 0L) * 10000) div $RecallK").as("recall_bp"))
      .orderBy($"query_id")
  }

  /** Hard cap on [[annRecallKnn]]'s input (the N² baseline at this N is
    * ~10^8 dot products — minutes, not hours; beyond it the require
    * fires instead of the job silently running quadratic). */
  val MaxRecallVecs = 10000L

  /** Dimension prefixes swept by [[annRecallTrunc]] — powers of two up to
    * the full width (the 64-dim row is the 100%-recall anchor proving the
    * sweep's top end, the q_ann_recall_frontier convention). */
  val TruncDims = Seq(8, 16, 32, 64)

  /** Query-set size for the truncation audit — larger than
    * [[Similarity.QueryVecs]] because the frontier reports a MEAN whose
    * resolution is 10000/(nq·k) basis points. */
  val TruncQueryVecs = 100L

  /** DIMENSION-BUDGET recall frontier (Matryoshka-style truncation audit,
    * Kusupati et al. 2022 arXiv:2205.13147): recall@[[RecallK]] of
    * brute-force search over PREFIX-TRUNCATED embeddings against the
    * full-width exact top-k, one row per prefix width in [[TruncDims]].
    * Cutting 64 → 16 dims is a 4× cut in index bytes, scan IO, and dot
    * cost at 100 TB — this measures what it costs in recall BEFORE a
    * build commits to it (the same measure-first discipline as the
    * (K, nprobe) frontier; the synthetic near-uniform embeddings spread
    * information evenly across dims, so the frontier here reads low —
    * real Matryoshka-trained embeddings front-load it).
    *
    * Shape: the dims axis EXPLODES from a 4-element literal (a Generate,
    * not a join — no BNLJ, no 4-partition shuffle key), the query set
    * broadcasts against the corpus (query-set-sized audit work, the
    * [[annRecall]] contract), truncated dots run through the native fused
    * [[qdot]] over sliced arrays, and the per-(dims, query) top-k window
    * partitions on a query-set-bounded key. One 4-row × 1-row assembly
    * crossJoin at the end (bounded, allowlisted). */
  def annRecallTrunc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
    val corpusD = e
      .select($"vec_id", explode(typedLit(TruncDims)).as("dims"), $"q")
      .select($"vec_id", $"dims", slice($"q", lit(1), $"dims").as("qd"))
    val queriesD = corpusD.filter($"vec_id" < TruncQueryVecs)
      .select($"vec_id".as("query_id"), $"dims", $"qd".as("qvd"))
    val w = Window.partitionBy($"dims", $"query_id").orderBy($"dot".desc, $"vec_id")
    // cached: the dims=64 baseline and the all-dims hit side both read it
    val tr = corpusD.join(broadcast(queriesD), Seq("dims"))
      .filter($"vec_id" =!= $"query_id")
      .select($"dims", $"query_id", $"vec_id", qdot($"qvd", $"qd").as("dot"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= RecallK)
      .select($"dims", $"query_id", $"vec_id")
      .graftCache()
    val exact = tr.filter($"dims" === 64).select($"query_id", $"vec_id")
    val hits = tr.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy($"dims").agg(count(lit(1)).as("h"))
    val nq = e.filter($"vec_id" < TruncQueryVecs).agg(count(lit(1)).as("n_queries"))
    TruncDims.toDF("dims")
      .crossJoin(broadcast(nq))
      .join(hits, Seq("dims"), "left")
      .select($"dims", $"n_queries",
        coalesce($"h", lit(0L)).as("n_hit"),
        expr(s"(coalesce(h, 0L) * 10000) div (n_queries * $RecallK)")
          .as("recall_bp"))
      .orderBy($"dims")
  }

  /** (K, nprobe) grid swept by [[annRecallFrontier]] — per trained index
    * size K, the probed-cell counts bracket the shipped operating point on
    * both sides and end at K (= full scan modulo the hot-cell guard: the
    * 100%-recall anchor that proves each sweep's top end). The two Ks are
    * the shared serving index ([[Similarity.IvfK]]) and the knn join's own
    * [[Similarity.KnnK]] (r9 measured K=32 ~ +4 recall points over K=16 at
    * matched candidate cost; r10 ships it). */
  val KnnSweep: Seq[(Int, Seq[Long])] = Seq(
    (Similarity.IvfK, Seq(2L, 4L, 6L, 8L, 12L, 16L)),
    (Similarity.KnnK, Seq(4L, 8L, 12L, 16L, 24L, 32L)))

  /** The RECALL/COST FRONTIER of the guarded kNN similarity join — one row
    * per [[KnnSweep]] (K, nprobe) point: mean recall@[[RecallK]] (basis
    * points, exact integer) and the candidate-pair count actually scored.
    * This is the measurement that PICKS ([[Similarity.KnnK]],
    * [[Similarity.KnnNprobe]]) — on this near-uniform synthetic corpus
    * recall tracks the scan fraction almost linearly (IVF's worst case),
    * and at a matched scan fraction the finer K=32 partition probes
    * closer-fitting cells, buying more recall per candidate pair; a
    * clustered corpus bends the curves further apart and the same sweep
    * finds the knee. Declared and oracle-gated so the frontier is a
    * durable artifact, re-measured per corpus snapshot.
    *
    * Scale shape PER K: ONE probe ranking pass (the knnJoin literal-array
    * argmin, extended to rank the top max-nprobe cells via posexplode),
    * ONE cell equi-join; the per-K pair streams union, the 12-row sweep
    * table equi-joins on k (then `rn <= nprobe` narrows), one
    * (k, nprobe, query) window for top-k, one exact-baseline pass shared
    * across ALL sweep points. AUDIT-SCALE-ONLY like [[annRecallKnn]] (the
    * baseline is N² — same [[MaxRecallVecs]] require; sample at 100 TB). */
  def annRecallFrontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.table(s, dir, "embeddings").count()
    require(n <= MaxRecallVecs,
      s"annRecallFrontier's exact baseline is N² — audit-scale only " +
        s"(≤ $MaxRecallVecs vectors); run it on a sample at corpus scale")
    val pairs = KnnSweep.map { case (k, nps) =>
      val (cents, cells) = Similarity.ivfModel(s, dir, k)
      val cl = typedLit(Similarity.centroidArrayOf(cents))
      val hot = cells.groupBy($"cell").agg(count(lit(1)).as("csz"))
        .filter($"csz" > Similarity.MaxKnnCell).select($"cell")
      val cand = cells.join(broadcast(hot), Seq("cell"), "left_anti")
      cells
        .select($"vec_id".as("query_id"), $"q".as("qv"), $"n2".as("qn2"))
        .select($"query_id", $"qv",
          posexplode(slice(array_sort(transform(cl, c =>
            struct(($"qn2" + c.getField("_3") - lit(2L) * qdot($"qv", c.getField("_2")))
              .as("d"), c.getField("_1").as("cid")))), 1, nps.max.toInt)))
        .select($"query_id", $"qv", ($"pos" + 1).cast("long").as("rn"),
          $"col.cid".as("cell"))
        .join(cand, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select(lit(k.toLong).as("k"), $"query_id", $"vec_id", $"rn",
          qdot($"qv", $"q").as("dot"))
    }.reduce(_ unionAll _)
      // pairs feed two sweep-side branches (top-k ranking + cost counting):
      // materialize above the fan-out, per the cache-placement discipline
      .graftCache()
    val sweep = KnnSweep
      .flatMap { case (k, nps) => nps.map(np => (k.toLong, np)) }
      .toDF("k", "nprobe")
    val sp = pairs.join(broadcast(sweep), Seq("k")).filter($"rn" <= $"nprobe")
    val w = Window.partitionBy($"k", $"nprobe", $"query_id")
      .orderBy($"dot".desc, $"vec_id")
    val ann = sp.withColumn("rnk", row_number().over(w)).filter($"rnk" <= RecallK)
      .select($"k", $"nprobe", $"query_id", $"vec_id")
    val e = Tables.table(s, dir, "embeddings")
      .select($"vec_id", quantize($"embedding").as("q"))
    val wx = Window.partitionBy($"query_id").orderBy($"dot".desc, $"vec_id")
    val exact = e
      .crossJoin(broadcast(e.select($"vec_id".as("query_id"), $"q".as("qv"))))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id", qdot($"qv", $"q").as("dot"))
      .withColumn("rnk", row_number().over(wx)).filter($"rnk" <= RecallK)
      .select($"query_id", $"vec_id")
    val hits = ann.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy($"k", $"nprobe").agg(count(lit(1)).as("h"))
    val cost = sp.groupBy($"k", $"nprobe").agg(count(lit(1)).as("cand_pairs"))
    sweep.join(hits, Seq("k", "nprobe"), "left")
      .join(cost, Seq("k", "nprobe"), "left")
      .select($"k", $"nprobe",
        expr(s"(coalesce(h, 0L) * 10000) div ($RecallK * $n)").as("mean_recall_bp"),
        coalesce($"cand_pairs", lit(0L)).as("cand_pairs"))
      .orderBy($"k", $"nprobe")
  }

  /** HARD-NEGATIVE MINING for contrastive training — the standard
    * embedding-training data step (DPR, Karpukhin et al. 2020): for each
    * vector, its nearest neighbors from a DIFFERENT source are the hard
    * negatives (similar enough to confuse the model, labeled different).
    * Built directly on the guarded all-N kNN join ([[Similarity.knnJoin]]
    * — the index a 100 TB run maintains anyway) plus two narrow doc_id
    * joins for the source labels; emits (query, negative, both sources).
    * Scale story = the knn join's; the label joins are AQE-sized. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.table(s, dir, "documents").select($"doc_id", $"source")
    Similarity.knnJoin(s, dir)
      .join(src.select($"doc_id".as("query_id"), $"source".as("q_src")),
        "query_id")
      .join(src.select($"doc_id".as("vec_id"), $"source".as("n_src")),
        "vec_id")
      .filter($"q_src" =!= $"n_src")
      .select($"query_id", $"vec_id", $"q_src", $"n_src")
      .orderBy($"query_id", $"vec_id")
  }

  /** Fixed phrase workload for [[phrase]]: multi-token exact phrases over
    * the space-delimited corpus (lengths 2 and 3, one with a repeated
    * token — the case adjacency-by-LIKE spellings get wrong). */
  val Phrases: Seq[(Int, String)] =
    Seq((1, "table scan"), (2, "hash join"), (3, "sort merge join"),
      (4, "batch batch"))

  /** EXACT PHRASE SEARCH via a positional inverted index — the lexical
    * retrieval primitive BM25's bag-of-words scoring cannot express
    * ("sort merge join" as consecutive tokens, not three terms anywhere).
    *
    * Shape at scale (the classic distributed positional-postings plan):
    * tokenize with positions (narrow posexplode), FILTER the postings to
    * the query vocabulary before anything wide — the only postings that
    * ever shuffle are for tokens some phrase mentions — then broadcast-join
    * the (word, offset) phrase table and group by (phrase, doc, pos−offset):
    * a start position where the number of DISTINCT matched offsets equals
    * the phrase length is an occurrence (distinct, not plain count, so a
    * repeated token like "batch batch" can't double-count one position).
    * Both the candidate-start aggregate and the per-doc hit count are
    * map-side combinable; nothing corpus-sized is ever sorted. Counting
    * positions (not LIKE) also makes overlapping occurrences exact:
    * "batch batch batch" contains "batch batch" TWICE — `replace`-based
    * counting sees one. */
  def phrase(s: SparkSession, dir: String): DataFrame =
    phraseOf(Tables.table(s, dir, "documents"), Phrases)

  /** [[phrase]] over any `(doc_id, text)` table and phrase set — fixture
    * entry point. The watch list is a SET of phrase texts: duplicate
    * texts (under distinct ids) are collapsed before indexing, because
    * the output keys on the text and a duplicated entry would otherwise
    * double every count (caught by the randomized property test). */
  private[graft] def phraseOf(docs: DataFrame, phrasesRaw: Seq[(Int, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val phrases = phrasesRaw.groupBy(_._2).map(_._2.head).toSeq.sortBy(_._1)
    val ph = phrases.toDF("phrase_id", "phrase")
    val pw = ph.select($"phrase_id", $"phrase",
        posexplode(split($"phrase", " ")).as(Seq("off", "w")))
    val plen = phrases.map { case (id, p) => (id, p.split(' ').length) }
      .toDF("phrase_id", "plen")
    val vocab = phrases.flatMap(_._2.split(' ')).distinct
    val toks = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .filter($"w".isin(vocab: _*))
    val starts = toks.join(broadcast(pw), "w")
      .select($"phrase_id", $"phrase", $"doc_id", ($"pos" - $"off").as("start"), $"off")
    // distinct-offset coverage as a BITMASK aggregate: bit_or combines
    // map-side without the distinct-expansion exchange countDistinct
    // plans (offsets are < 64 by the phrase-length contract), so the
    // candidate-start aggregate stays a plain two-phase combinable agg
    starts.groupBy($"phrase_id", $"phrase", $"doc_id", $"start")
      .agg(expr("bit_count(bit_or(shiftleft(CAST(1 AS BIGINT), off)))").as("noff"))
      .join(broadcast(plen), "phrase_id")
      .filter($"noff" === $"plen")
      .groupBy($"phrase", $"doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy($"phrase", $"doc_id")
  }

  /** STREAM-SAFE PHRASE DETECTOR — the live half of [[phrase]]: per-row
    * adjacency check of every watch phrase, entirely in codegen'd array
    * lambdas (no index, no shuffle, no state), emitting one (doc_id,
    * phrase) row per matched phrase as documents ARRIVE. The batch index
    * ([[phraseOf]]) answers "where and how often" over the corpus; this
    * answers "does the arriving document contain a watched phrase" — the
    * decontamination/alerting spelling (the winnow-decontamination
    * discipline applied to literal phrases). Streaming ≡ batch existence
    * pinned in `RetrievalSpec`. */
  private[graft] def phraseFlagsOf(docs: DataFrame,
      phrasesRaw: Seq[(Int, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // same set-of-texts contract as [[phraseOf]]
    val phrases = phrasesRaw.groupBy(_._2).map(_._2.head).toSeq.sortBy(_._1)
    val cols = phrases.map { case (_, p) =>
      val ws = p.split(' ')
      val len = ws.length
      val hit = when(size($"toks") >= len,
        exists(sequence(lit(0), size($"toks") - len), i =>
          ws.zipWithIndex.map { case (w, j) =>
            element_at($"toks", i + j + 1) === w
          }.reduce(_ && _)))
        .otherwise(lit(false))
      struct(lit(p).as("phrase"), hit.as("hit"))
    }
    docs.select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id",
        explode(filter(array(cols: _*), c => c("hit"))).as("m"))
      .select($"doc_id", $"m.phrase".as("phrase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bm25" -> bm25 _,
    "q_retrieval_phrase" -> phrase _,
    "q_retrieval_rrf" -> rrf _,
    "q_ann_recall" -> annRecall _,
    "q_ann_recall_trunc" -> annRecallTrunc _,
    "q_ann_recall_ivf" -> annRecallIvf _,
    "q_ann_recall_pq" -> annRecallPq _,
    "q_ann_recall_knn" -> annRecallKnn _,
    "q_ann_recall_frontier" -> annRecallFrontier _,
    "q_retrieval_hard_negatives" -> hardNegatives _,
  )

  private val termList = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** The BM25 scored-document table as CTEs ending in `bms(doc_id,
    * score_micro, n_terms)` — shared by the bm25 and rrf oracles. */
  private val duckBm25Ctes: String =
    s"""d AS (SELECT doc_id, ${duckTokens("lower(text)")} AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
       |st AS (SELECT count(*) AS n, sum(dl) // count(*) AS avgdl FROM dl),
       |t AS (SELECT doc_id, unnest(w) AS term FROM d),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       |  WHERE term IN ($termList) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (SELECT tf.doc_id,
       |    (CAST(floor(ln(CAST(2 * st.n + 2 AS DOUBLE) / (2 * df.df + 1)) * 1000000) AS BIGINT)
       |      * tf.tf * ${K1Centi + 100L} * 100 * st.avgdl)
       |    // (tf.tf * 10000 * st.avgdl + $K1Centi * ${100L - BCenti} * st.avgdl
       |        + $K1Centi * $BCenti * dl.dl) AS c
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), st),
       |bms AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM sc GROUP BY doc_id)""".stripMargin

  private val phraseValues =
    Phrases.map { case (id, p) => s"($id, '$p')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    // the positional index replayed in SQL: zipped unnest(token, position),
    // phrase words with offsets, start = pos − off, an occurrence where the
    // distinct matched offsets cover the phrase length
    "q_retrieval_phrase" ->
      s"""WITH ph(phrase_id, phrase) AS (VALUES $phraseValues),
         |pw AS (SELECT phrase_id, phrase,
         |    unnest(string_split(phrase, ' ')) AS w,
         |    unnest(generate_series(1, len(string_split(phrase, ' ')))) AS off
         |  FROM ph),
         |plen AS (SELECT phrase_id, count(*) AS plen FROM pw GROUP BY 1),
         |toks AS (SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS w,
         |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         |  FROM documents),
         |starts AS (SELECT pw.phrase_id, pw.phrase, t.doc_id,
         |    t.pos - pw.off AS start, pw.off
         |  FROM toks t JOIN pw ON pw.w = t.w),
         |occ AS (SELECT phrase_id, phrase, doc_id, start,
         |    count(DISTINCT off) AS noff
         |  FROM starts GROUP BY 1, 2, 3, 4),
         |hits AS (SELECT o.phrase, o.doc_id, count(*) AS n_hits
         |  FROM occ o JOIN plen l USING (phrase_id)
         |  WHERE o.noff = l.plen GROUP BY 1, 2)
         |SELECT phrase, doc_id, CAST(n_hits AS BIGINT) AS n_hits
         |FROM hits ORDER BY phrase, doc_id""".stripMargin,
    "q_text_bm25" ->
      s"""WITH $duckBm25Ctes
         |SELECT doc_id, score_micro, n_terms FROM bms
         |ORDER BY score_micro DESC, doc_id LIMIT $TopK""".stripMargin,
    // both arms cut to their top-RrfPool by rank, full-outer fused with
    // integer reciprocal ranks — absent arms contribute 0
    "q_retrieval_rrf" ->
      s"""WITH $duckBm25Ctes,
         |lex AS (SELECT doc_id, r_lex FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r_lex
         |  FROM bms) WHERE r_lex <= $RrfPool),
         |e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
         |  FROM embeddings),
         |qv AS (SELECT q FROM e WHERE vec_id = $DenseQueryVec),
         |dd AS (SELECT e.vec_id AS doc_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> e.q[i] * qv.q[i])) AS BIGINT) AS dot
         |  FROM e, qv WHERE e.vec_id <> $DenseQueryVec),
         |den AS (SELECT doc_id, r_den FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY dot DESC, doc_id) AS r_den
         |  FROM dd) WHERE r_den <= $RrfPool),
         |f AS (SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
         |    COALESCE(1000000 // ($RrfK + r_lex), 0)
         |      + COALESCE(1000000 // ($RrfK + r_den), 0) AS rrf_micro,
         |    COALESCE(r_lex, 0) AS r_lex, COALESCE(r_den, 0) AS r_den
         |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
         |SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
         |  CAST(r_lex AS BIGINT) AS r_lex, CAST(r_den AS BIGINT) AS r_den
         |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT $RrfTop""".stripMargin,
    // exact top-k and the full LSH multiprobe plan re-derived in SQL (the
    // bit_count pair join is oracle-scale-only, per Similarity's Scaladoc),
    // then recall = |ann ∩ exact| per query
    // the truncation frontier replayed: per dims, prefix dots via
    // generate_series(1, dims), top-3 vs the dims=64 rows of the SAME table
    "q_ann_recall_trunc" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
         |  FROM embeddings),
         |dm AS (SELECT unnest([${TruncDims.mkString(", ")}]) AS dims),
         |trc AS (SELECT d.dims, qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, d.dims),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM e qr JOIN e c ON qr.vec_id <> c.vec_id, dm d
         |  WHERE qr.vec_id < $TruncQueryVecs),
         |tr AS (SELECT dims, query_id, vec_id FROM (
         |  SELECT dims, query_id, vec_id,
         |    row_number() OVER (PARTITION BY dims, query_id
         |      ORDER BY dot DESC, vec_id) AS rnk
         |  FROM trc) WHERE rnk <= $RecallK),
         |ex AS (SELECT query_id, vec_id FROM tr WHERE dims = 64),
         |h AS (SELECT tr.dims, count(*) AS h
         |  FROM tr JOIN ex ON ex.query_id = tr.query_id
         |    AND ex.vec_id = tr.vec_id
         |  GROUP BY tr.dims),
         |nq AS (SELECT count(*) AS nq FROM e WHERE vec_id < $TruncQueryVecs)
         |SELECT CAST(d.dims AS INT) AS dims,
         |  CAST(nq.nq AS BIGINT) AS n_queries,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hit,
         |  CAST((COALESCE(h.h, 0) * 10000) // (nq.nq * $RecallK) AS BIGINT)
         |    AS recall_bp
         |FROM dm d CROSS JOIN nq LEFT JOIN h ON h.dims = d.dims
         |ORDER BY dims""".stripMargin,
    "q_ann_recall" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
         |  FROM embeddings),
         |b AS (SELECT vec_id, q,
         |    CAST(list_sum(list_transform(generate_series(0, ${Similarity.Planes - 1}), p ->
         |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
         |          d -> q[d] * ((((1103515245 * (d - 1) + 12345 * p) >> 16) & 1) * 2 - 1))) > 0
         |        THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bkt
         |  FROM e),
         |annc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM b qr JOIN b c
         |  ON bit_count(xor(qr.bkt, c.bkt)) <= 2 AND qr.vec_id <> c.vec_id
         |  WHERE qr.vec_id < ${Similarity.QueryVecs}),
         |ann AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM annc) WHERE rnk <= $RecallK),
         |exc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM e qr JOIN e c ON qr.vec_id <> c.vec_id
         |  WHERE qr.vec_id < ${Similarity.QueryVecs}),
         |ex AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM exc) WHERE rnk <= $RecallK),
         |h AS (SELECT ex.query_id, count(*) AS h
         |  FROM ex JOIN ann USING (query_id, vec_id) GROUP BY ex.query_id)
         |SELECT e.vec_id AS query_id,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hit,
         |  CAST((COALESCE(h.h, 0) * 10000) // $RecallK AS BIGINT) AS recall_bp
         |FROM e LEFT JOIN h ON h.query_id = e.vec_id
         |WHERE e.vec_id < ${Similarity.QueryVecs}
         |ORDER BY query_id""".stripMargin,
    // the IVF nprobe plan re-derived over the same k-means CTE chain as the
    // q_similarity_ivf_probe oracle, scored against the exact top-k
    "q_ann_recall_ivf" ->
      s"""WITH ${Similarity.duckCellCtes},
         |probes AS (SELECT query_id, q, cell FROM (
         |  SELECT e.vec_id AS query_id, e.q, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, 64),
         |        i -> (e.q[i] - c.q[i]) * (e.q[i] - c.q[i]))), c.cid) AS rn
         |  FROM e CROSS JOIN c2 c WHERE e.vec_id < ${Similarity.QueryVecs})
         |  WHERE rn <= ${Similarity.IvfNprobe}),
         |annc AS (SELECT p.query_id, a.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> p.q[i] * a.q[i])) AS BIGINT) AS dot
         |  FROM probes p JOIN a3 a ON a.cell = p.cell AND a.vec_id <> p.query_id),
         |ann AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM annc) WHERE rnk <= $RecallK),
         |exc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM e qr JOIN e c ON qr.vec_id <> c.vec_id
         |  WHERE qr.vec_id < ${Similarity.QueryVecs}),
         |ex AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM exc) WHERE rnk <= $RecallK),
         |h AS (SELECT ex.query_id, count(*) AS h
         |  FROM ex JOIN ann USING (query_id, vec_id) GROUP BY ex.query_id)
         |SELECT e.vec_id AS query_id,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hit,
         |  CAST((COALESCE(h.h, 0) * 10000) // $RecallK AS BIGINT) AS recall_bp
         |FROM e LEFT JOIN h ON h.query_id = e.vec_id
         |WHERE e.vec_id < ${Similarity.QueryVecs}
         |ORDER BY query_id""".stripMargin,
    // PQ IP-ADC search re-derived over the same codebook CTE chains as the
    // q_embedding_pq oracle, scored against the exact top-k: per subspace a
    // query×centroid dot lookup, summed per (query, vector) via the codes.
    "q_ann_recall_pq" -> {
      import Embeddings.{PqDim, PqSub}
      val qds = (0 until PqSub).map(m =>
        s"""qd$m AS (SELECT q.vec_id AS query_id, c.cid AS cell,
           |    CAST(list_sum(list_transform(generate_series(1, $PqDim),
           |      i -> q.q[i] * c.q[i])) AS BIGINT) AS pd
           |  FROM m${m}e q CROSS JOIN m${m}c2 c
           |  WHERE q.vec_id < ${Similarity.QueryVecs})""".stripMargin).mkString(",\n")
      val adcu = (0 until PqSub).map(m =>
        s"SELECT qd$m.query_id, a.vec_id, qd$m.pd FROM m${m}a3 a " +
          s"JOIN qd$m ON a.cell = qd$m.cell").mkString("\n  UNION ALL ")
      s"""WITH ${Embeddings.duckPqCtes},
         |$qds,
         |adcu AS ($adcu),
         |adc AS (SELECT query_id, vec_id, CAST(sum(pd) AS BIGINT) AS adc
         |  FROM adcu WHERE vec_id <> query_id GROUP BY 1, 2),
         |ann AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rnk
         |  FROM adc) WHERE rnk <= $RecallK),
         |exc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.qv[i] * c.qv[i])) AS BIGINT) AS dot
         |  FROM eq qr JOIN eq c ON qr.vec_id <> c.vec_id
         |  WHERE qr.vec_id < ${Similarity.QueryVecs}),
         |ex AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM exc) WHERE rnk <= $RecallK),
         |h AS (SELECT ex.query_id, count(*) AS h
         |  FROM ex JOIN ann USING (query_id, vec_id) GROUP BY ex.query_id)
         |SELECT eq.vec_id AS query_id,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hit,
         |  CAST((COALESCE(h.h, 0) * 10000) // $RecallK AS BIGINT) AS recall_bp
         |FROM eq LEFT JOIN h ON h.query_id = eq.vec_id
         |WHERE eq.vec_id < ${Similarity.QueryVecs}
         |ORDER BY query_id""".stripMargin
    },
    // the guarded knn-join plan re-derived over the same k-means + MaxKnnCell
    // CTE chain as the q_similarity_knn_join oracle, scored per query against
    // the all-pairs exact top-k (N² — oracle scale only, per the Scaladoc)
    "q_ann_recall_knn" ->
      s"""WITH ${Similarity.duckCellCtesK(Similarity.KnnK, "")},
         |${Similarity.duckKnnCandCte},
         |annc AS (SELECT p.query_id, a.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> p.q[i] * a.q[i])) AS BIGINT) AS dot
         |  FROM knnprobes p
         |  JOIN knncand a ON a.cell = p.cell AND a.vec_id <> p.query_id),
         |ann AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM annc) WHERE rnk <= $RecallK),
         |exc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM e qr JOIN e c ON qr.vec_id <> c.vec_id),
         |ex AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM exc) WHERE rnk <= $RecallK),
         |h AS (SELECT ex.query_id, count(*) AS h
         |  FROM ex JOIN ann USING (query_id, vec_id) GROUP BY ex.query_id)
         |SELECT e.vec_id AS query_id,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hit,
         |  CAST((COALESCE(h.h, 0) * 10000) // $RecallK AS BIGINT) AS recall_bp
         |FROM e LEFT JOIN h ON h.query_id = e.vec_id
         |ORDER BY query_id""".stripMargin,
    // the full (K, nprobe) sweep re-derived once: one k-means chain per
    // index size (suffix "" = IvfK, "b" = KnnK), probe ranks over all K
    // cells, the guarded candidate join per chain, pair streams unioned
    // with a k column, then per-(k, nprobe) top-3 vs the one exact baseline
    "q_ann_recall_frontier" -> {
      def chain(k: Int, sfx: String): String =
        s"""fhot$sfx AS (SELECT cell FROM a3$sfx GROUP BY cell
           |  HAVING count(*) > ${Similarity.MaxKnnCell}),
           |fcand$sfx AS (SELECT * FROM a3$sfx
           |  WHERE cell NOT IN (SELECT cell FROM fhot$sfx)),
           |pr$sfx AS (SELECT e.vec_id AS query_id, e.q, c.cid AS cell,
           |    CAST(row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |      list_sum(list_transform(generate_series(1, 64),
           |        i -> (e.q[i] - c.q[i]) * (e.q[i] - c.q[i]))), c.cid) AS BIGINT) AS rn
           |  FROM e$sfx e CROSS JOIN c2$sfx c),
           |prs$sfx AS (SELECT CAST($k AS BIGINT) AS k, p.query_id, a.vec_id, p.rn,
           |    CAST(list_sum(list_transform(generate_series(1, 64),
           |      i -> p.q[i] * a.q[i])) AS BIGINT) AS dot
           |  FROM pr$sfx p JOIN fcand$sfx a
           |  ON a.cell = p.cell AND a.vec_id <> p.query_id)""".stripMargin
      val swRows = KnnSweep
        .flatMap { case (k, nps) => nps.map(np => s"($k, $np)") }.mkString(", ")
      s"""WITH ${Similarity.duckCellCtesK(Similarity.IvfK, "")},
         |${Similarity.duckCellCtesK(Similarity.KnnK, "b")},
         |sw(k, nprobe) AS (SELECT CAST(c0 AS BIGINT), CAST(c1 AS BIGINT)
         |  FROM (VALUES $swRows) t(c0, c1)),
         |${chain(Similarity.IvfK, "")},
         |${chain(Similarity.KnnK, "b")},
         |pall AS (SELECT * FROM prs UNION ALL SELECT * FROM prsb),
         |sp AS (SELECT s.k, s.nprobe, p.query_id, p.vec_id, p.dot
         |  FROM pall p JOIN sw s ON p.k = s.k AND p.rn <= s.nprobe),
         |ann AS (SELECT k, nprobe, query_id, vec_id FROM (
         |  SELECT k, nprobe, query_id, vec_id,
         |    row_number() OVER (PARTITION BY k, nprobe, query_id
         |      ORDER BY dot DESC, vec_id) AS rnk
         |  FROM sp) WHERE rnk <= $RecallK),
         |exc AS (SELECT qr.vec_id AS query_id, c.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> qr.q[i] * c.q[i])) AS BIGINT) AS dot
         |  FROM e qr JOIN e c ON qr.vec_id <> c.vec_id),
         |ex AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM exc) WHERE rnk <= $RecallK),
         |h AS (SELECT k, nprobe, count(*) AS h
         |  FROM ann JOIN ex USING (query_id, vec_id) GROUP BY k, nprobe),
         |cp AS (SELECT k, nprobe, count(*) AS cand_pairs FROM sp GROUP BY k, nprobe),
         |n AS (SELECT count(*) AS nv FROM e)
         |SELECT sw.k, sw.nprobe,
         |  CAST((COALESCE(h.h, 0) * 10000) // ($RecallK * n.nv) AS BIGINT) AS mean_recall_bp,
         |  CAST(COALESCE(cp.cand_pairs, 0) AS BIGINT) AS cand_pairs
         |FROM sw LEFT JOIN h USING (k, nprobe) LEFT JOIN cp USING (k, nprobe), n
         |ORDER BY k, nprobe""".stripMargin
    },
    // the guarded knn-join top-3, cross-source members only
    "q_retrieval_hard_negatives" ->
      s"""WITH ${Similarity.duckCellCtesK(Similarity.KnnK, "")},
         |${Similarity.duckKnnCandCte},
         |cand AS (SELECT p.query_id, a.vec_id,
         |    CAST(list_sum(list_transform(generate_series(1, 64),
         |      i -> p.q[i] * a.q[i])) AS BIGINT) AS dot
         |  FROM knnprobes p
         |  JOIN knncand a ON a.cell = p.cell AND a.vec_id <> p.query_id),
         |knn AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM cand) WHERE rnk <= 3)
         |SELECT k.query_id, k.vec_id, dq.source AS q_src, dn.source AS n_src
         |FROM knn k
         |JOIN documents dq ON dq.doc_id = k.query_id
         |JOIN documents dn ON dn.doc_id = k.vec_id
         |WHERE dq.source <> dn.source
         |ORDER BY query_id, vec_id""".stripMargin,
  )
}
