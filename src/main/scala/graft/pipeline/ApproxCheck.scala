package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Driver-visible tolerance verdicts for the two no-oracle approximate
  * queries. Their error bounds were previously pinned only in ScalaTest
  * (`CurationSpec`), invisible to the per-round correctness artifacts —
  * a silent drift would have shown up as nothing worse than a row count.
  * `graft.Verify` calls this and emits `approx_check` / `approx_observed`
  * / `approx_bound` into `query_status.json`, so the driver sees the same
  * pass/fail the test suite enforces:
  *
  *  - `q_text_length_stats_approx`: each approx quantile must be an
  *    element whose rank lies within `p·n ± (n/Accuracy + 1)` of the
  *    target (the t-digest rank guarantee); observed = worst rank
  *    deviation as a fraction of that slack (bound 1.0). n_docs/min/max
  *    must be exact — any miss reports observed 999.
  *  - `q_text_vocab_approx`: HLL++ estimate within 5σ of the exact
  *    distinct count (σ = rsd·exact); observed = worst deviation in
  *    sigmas (bound 5.0).
  */
object ApproxCheck {

  /** JSON fragments (no braces) keyed by query name, for the queries in
    * `ran`; errors in the check itself surface as `"approx_check":
    * "error"` rather than aborting the Verify sweep. */
  def verdicts(s: SparkSession, dir: String, ran: Set[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    def add(name: String)(check: => (Boolean, Double, Double)): Unit =
      if (ran.contains(name)) out += name -> (
        try {
          val (pass, observed, bound) = check
          f""""approx_check": "${if (pass) "pass" else "fail"}", """ +
            f""""approx_observed": $observed%.4f, "approx_bound": $bound%.4f"""
        } catch {
          case e: Throwable =>
            s""""approx_check": "error", "approx_err": "${e.getClass.getName}""""
        })
    add("q_text_length_stats_approx")(lengthStats(s, dir))
    add("q_text_vocab_approx")(vocab(s, dir))
    out.result()
  }

  private def lengthStats(s: SparkSession, dir: String): (Boolean, Double, Double) = {
    import s.implicits._
    val approx = TextAnalysis.lengthStatsApprox(s, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val bySource = graft.sources.Tables.table(s, dir, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    var worst = 0.0
    approx.foreach { case (src, nDocs, mn, mx, a50, a90) =>
      val vals = bySource(src)
      val n = vals.length
      if (nDocs != n || mn != vals.head || mx != vals.last)
        worst = worst.max(999.0)
      val slack = (n / TextAnalysis.ApproxAccuracy + 1).toDouble
      for ((p, a) <- Seq(0.5 -> a50, 0.9 -> a90)) {
        val target = (p * n).toInt
        val ranks = vals.indices.filter(i => vals(i) == a)
        val dev =
          if (ranks.isEmpty) 999.0 * slack
          else ranks.map(i => math.abs(i - target)).min.toDouble
        worst = worst.max(dev / slack)
      }
    }
    (approx.nonEmpty && worst <= 1.0, worst, 1.0)
  }

  private def vocab(s: SparkSession, dir: String): (Boolean, Double, Double) = {
    import s.implicits._
    val exact = TextAnalysis.vocab(s, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = TextAnalysis.vocabApprox(s, dir)
      .as[(String, Long, Long)].collect()
    var worst = 0.0
    approx.foreach { case (src, nSh, nApprox) =>
      val (nShExact, nExact) = exact(src)
      if (nSh != nShExact) worst = worst.max(999.0)
      worst = worst.max(
        math.abs(nApprox - nExact).toDouble / (TextAnalysis.VocabRsd * nExact))
    }
    (approx.nonEmpty && approx.length == exact.size && worst <= 5.0, worst, 5.0)
  }
}
