package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series regularization over the events stream: resample an irregular
  * per-key event sequence onto a fixed bucket grid and FORWARD-FILL the
  * gaps — the preprocessing every downstream window model assumes ("value
  * as of bucket t, for every t"), and the op the plain window inventory
  * ([[TimeWindows]]) lacks: tumbling aggregation drops empty buckets,
  * gap-fill materializes them with the last observation carried forward.
  */
object TimeSeries {

  /** Resample bucket width. 6 h over the 30-day events span yields ~120
    * buckets per user against ~13 purchase events — sparse enough that the
    * fill path (not the copy path) carries the query. */
  val BucketHours = 6

  /** Per-user purchase-value series on a regular [[BucketHours]] grid:
    * observed buckets aggregate exact integer cents (doubles quantized
    * per-row BEFORE the sum — order-independent); missing buckets are
    * materialized from each user's min..max observed bucket and filled
    * with the previous bucket's value (`n_obs = 0` marks the fills; the
    * first bucket is observed by construction, so `filled_cents` is total).
    *
    * Shape at scale: one scan → map-side-combinable (user, bucket)
    * aggregate; the grid explodes off the USERS × 1 span table (output is
    * grid-sized, never events-sized: span/bucket controls it); the fill is
    * one per-user window pass ordered by bucket — the partition is a
    * single user's grid, bounded by span/bucket, so no stratum ever
    * outgrows a task the way a global sort would. DuckDB mirrors with
    * generate_series + last_value IGNORE NULLS. */
  def gapfill(s: SparkSession, dir: String): DataFrame =
    gapfillOf(Tables.events(s, dir))

  /** [[gapfill]] over any `(user_id, ts, event_type, value)` events table —
    * fixture entry point. */
  def gapfillOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val obs = events
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("ts_sec"),
        floor($"value" * 100).cast("long").as("vc"))
      .groupBy($"user_id", window($"ts_sec", s"$BucketHours hours"))
      .agg(sum($"vc").as("cents"), count(lit(1)).as("n_obs"))
      .select($"user_id", $"window.start".as("b"), $"cents", $"n_obs")
    val span = obs.groupBy($"user_id").agg(min($"b").as("b0"), max($"b").as("b1"))
    val grid = span.select($"user_id",
      explode(sequence($"b0", $"b1", expr(s"INTERVAL $BucketHours HOURS"))).as("b"))
    val w = Window.partitionBy($"user_id").orderBy($"b")
    grid.join(obs, Seq("user_id", "b"), "left")
      .withColumn("filled_cents", last($"cents", ignoreNulls = true).over(w))
      .select($"user_id", $"b".as("bstart"), $"filled_cents",
        coalesce($"n_obs", lit(0L)).as("n_obs"))
      .orderBy($"user_id", $"bstart")
  }

  /** [[anomaly]] trailing window (buckets) and spike multiple: flag a
    * bucket whose volume exceeds [[SpikeMult]]× its trailing
    * [[TrailN]]-bucket average — integer cross-multiplied
    * (`cents·TrailN > SpikeMult·trailing_sum`), no division at all. */
  val TrailN = 8
  val SpikeMult = 5L

  /** Volume-spike detection on the regularized series — the monitoring twin
    * of [[gapfill]]: the same per-user bucket grid, but gaps count as ZERO
    * volume (a spike detector that forward-fills would mute the very
    * signal it hunts), each bucket compared against its trailing
    * [[TrailN]]-bucket average. Only buckets with a FULL trailing window
    * flag (partial history is warm-up, not evidence). Output: flagged
    * buckets with the volume and trailing-sum context.
    *
    * Shape at scale: [[gapfill]]'s grid (output grid-sized, span/bucket-
    * bounded strata) plus ONE more per-user window frame pass — the
    * trailing sum rides the same (user, bucket) sort the fill used, so
    * the second window adds no exchange. */
  def anomaly(s: SparkSession, dir: String): DataFrame =
    anomalyOf(Tables.events(s, dir))

  /** [[anomaly]] over any `(user_id, ts, event_type, value)` events table —
    * fixture entry point. */
  def anomalyOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val obs = events
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("ts_sec"),
        floor($"value" * 100).cast("long").as("vc"))
      .groupBy($"user_id", window($"ts_sec", s"$BucketHours hours"))
      .agg(sum($"vc").as("cents"))
      .select($"user_id", $"window.start".as("b"), $"cents")
    val span = obs.groupBy($"user_id").agg(min($"b").as("b0"), max($"b").as("b1"))
    val grid = span.select($"user_id",
      explode(sequence($"b0", $"b1", expr(s"INTERVAL $BucketHours HOURS"))).as("b"))
    val w = Window.partitionBy($"user_id").orderBy($"b")
      .rowsBetween(-TrailN, -1)
    grid.join(obs, Seq("user_id", "b"), "left")
      .withColumn("cents", coalesce($"cents", lit(0L)))
      .withColumn("tsum", coalesce(sum($"cents").over(w), lit(0L)))
      .withColumn("tn", count(lit(1)).over(w))
      .filter($"tn" === TrailN && $"cents" > 0 &&
        $"cents" * TrailN > lit(SpikeMult) * $"tsum")
      .select($"user_id", $"b".as("bstart"), $"cents", $"tsum")
      .orderBy($"user_id", $"bstart")
  }

  /** [[ewma]] smoothing weight as an exact rational: α = 1/[[EwmaDen]]
    * with the complement (EwmaDen−1)/EwmaDen — s′ = (x + 3s) div 4. */
  val EwmaDen = 4L
  /** Fixed-point scale for the smoothed level (micro-cents). */
  val EwmaScale = 1000000L

  /** Per-user EWMA of purchase value — the "current smoothed spend level"
    * feature every per-key monitoring/featurization pass derives, as an
    * EXACT integer fold: cents are scaled to micro-cents, then
    * `s_i = (x_i + (EwmaDen−1)·s_{i−1}) div EwmaDen` with floor division
    * at every step (deterministic, no float accumulation, bit-identical
    * to the oracle's `list_reduce` fold). Output: the final smoothed
    * level per user, the raw last observation, and the count.
    *
    * Shape at scale: a sequential fold is inherently ordered, so the
    * per-user series is collected into ONE array row and folded entirely
    * inside per-row array lambdas (the [[graft.pipeline.Winnowing]]
    * shape) — one (user) shuffle of events-sized data, zero window
    * exchanges, fold cost linear per user. Per-user event counts are
    * ingest-bounded (a key's history fits a row by the same argument the
    * CEP state contract makes); a corpus-sized global sort never appears. */
  def ewma(s: SparkSession, dir: String): DataFrame =
    ewmaOf(Tables.events(s, dir))

  /** [[ewma]] over any `(user_id, ts, event_type, value, event_id)` events
    * table — fixture entry point. */
  def ewmaOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter($"event_type" === "purchase")
      // second-truncated fold order — the ONE ordering contract shared
      // with the streaming twin (EwmaStream folds at second resolution):
      // raw-ts ordering would diverge on sub-second ties where ms order
      // contradicts event_id order
      .select($"user_id", struct(date_trunc("second", $"ts").as("ts"),
        $"event_id",
        (floor($"value" * 100).cast("long") * EwmaScale).as("x")).as("e"))
      .groupBy($"user_id")
      .agg(array_sort(collect_list($"e")).as("es"), count(lit(1)).as("n_obs"))
      .select($"user_id", $"n_obs",
        expr(s"""aggregate(slice(es.x, 2, size(es) - 1),
                |  element_at(es.x, 1),
                |  (acc, x) -> (x + ${EwmaDen - 1L} * acc) div $EwmaDen)"""
          .stripMargin.replace("\n", " ")).as("ewma_micro"),
        expr(s"element_at(es.x, size(es)) div $EwmaScale").as("last_cents"))
      .orderBy($"user_id")
  }

  /** HOLT LINEAR-TREND forecasting (double exponential smoothing, Holt
    * 1957) — the next tier above [[ewma]]'s level-only smoothing: per
    * user, the zero-filled DAILY purchase-cents series is folded through
    *
    *   l_t = (y_t·S + l_{t−1} + b_{t−1}) >> 1        (α = 1/2)
    *   b_t = ((l_t − l_{t−1}) + b_{t−1}) >> 1        (β = 1/2)
    *
    * in exact micro-cent integers — α = β = 1/2 make every step one
    * ARITHMETIC SHIFT, which floors identically in Spark
    * (`shiftright`) and DuckDB (`>>`) even on negative trends, so the
    * fold is bit-identical cross-engine with no float and no
    * truncate-vs-floor divergence (the hazard `div`/`//` carry on
    * negatives across engine versions). Init: l_1 = y_1·S, b_1 = 0.
    * Output per user: day count, final level/trend (micro-cents) and the
    * 7-day-ahead forecast l + 7·b — the "where is this key's spend
    * heading" feature a monitoring pipeline derives per key.
    *
    * Shape at scale: the zero-filled grid is the [[gapfill]] machinery
    * (per-user day span join — span bounded by the corpus TIME WINDOW,
    * not by event volume), then the [[ewma]] sequential-fold shape: one
    * (user) shuffle, the 2-field [l, b] array accumulator folds entirely
    * inside codegen'd array lambdas, no window exchange. The oracle folds
    * the SAME recursion with a LIST accumulator (`list_reduce` struct
    * accumulators mis-evaluate on DuckDB 1.0 — see q_ts_cusum's note —
    * but list accumulators are sound, verified by hand-fold fixture). */
  def holt(s: SparkSession, dir: String): DataFrame =
    holtOf(Tables.events(s, dir))

  /** Per-user zero-filled DAILY purchase-cents series: `(user_id, n_days,
    * ys)` with ys ordered from the user's first to last observed day —
    * the shared input of [[holtOf]] and [[holtWintersOf]]. Span bounded
    * by the corpus time window, never by event volume. */
  private def dailySeries(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).as("d"))
      .agg(sum(floor($"value" * 100).cast("long")).as("cents"))
      .groupBy($"user_id")
      .agg(map_from_entries(collect_list(struct($"d", $"cents"))).as("m"),
        min($"d").as("d0"), max($"d").as("d1"))
      .withColumn("ys", expr(
        "transform(sequence(d0, d1), i -> coalesce(element_at(m, i), 0L))"))
      .select($"user_id", size($"ys").cast("long").as("n_days"), $"ys")
  }

  /** [[holt]] over any `(user_id, ts, event_type, value)` events table —
    * fixture entry point. */
  private[graft] def holtOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val S = EwmaScale
    dailySeries(events)
      .select($"user_id", $"n_days",
        expr(
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |  array(element_at(ys, 1) * ${S}L, 0L),
             |  (acc, y) -> array(
             |    shiftright(y * ${S}L + element_at(acc, 1) + element_at(acc, 2), 1),
             |    shiftright(
             |      shiftright(y * ${S}L + element_at(acc, 1) + element_at(acc, 2), 1)
             |        - element_at(acc, 1) + element_at(acc, 2), 1)))"""
            .stripMargin.replace("\n", " ")).as("lb"))
      .select($"user_id", $"n_days",
        expr("element_at(lb, 1)").as("level_micro"),
        expr("element_at(lb, 2)").as("trend_micro"),
        expr("element_at(lb, 1) + 7 * element_at(lb, 2)").as("forecast7_micro"))
      .orderBy($"user_id")
  }

  /** Weekly seasonality period for [[holtWinters]]. */
  val HwPeriod = 7

  /** HOLT–WINTERS additive seasonal forecasting (triple exponential
    * smoothing, Winters 1960) at α = β = γ = 1/2 — [[holt]]'s recursion
    * plus a rotating [[HwPeriod]]-slot seasonal register, every update
    * still ONE arithmetic shift (floor-identical cross-engine on
    * negatives):
    *
    *   l_t = (y_t·S − s_{t−7} + l_{t−1} + b_{t−1}) >> 1
    *   b_t = ((l_t − l_{t−1}) + b_{t−1}) >> 1
    *   s_t = (y_t·S − l_t + s_{t−7}) >> 1
    *
    * with zero-initialized seasonals (the warm-up is absorbed by the fold
    * — a DEFINED deterministic variant, the property the oracle pins).
    * The accumulator is [l, b, s₁..s₇]; each step consumes the head
    * seasonal (the same weekday one cycle ago) and appends the refreshed
    * one, so slot alignment is maintained by rotation alone. Output:
    * level/trend, the seasonal that applies to the NEXT day, and the
    * one-day-ahead forecast l + b + s_next — the weekly-pattern-aware
    * counterpart of [[holt]]'s trend-only 7-day projection. Same
    * one-(user)-shuffle gapfilled-fold shape. */
  def holtWinters(s: SparkSession, dir: String): DataFrame =
    holtWintersOf(Tables.events(s, dir))

  /** [[holtWinters]] over any events table — fixture entry point. */
  private[graft] def holtWintersOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val S = EwmaScale
    val lNew = "shiftright(y * " + S + "L - element_at(acc, 3)" +
      " + element_at(acc, 1) + element_at(acc, 2), 1)"
    dailySeries(events)
      .select($"user_id", $"n_days",
        expr(
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |  concat(array(element_at(ys, 1) * ${S}L, 0L),
             |    array_repeat(0L, ${HwPeriod})),
             |  (acc, y) -> concat(
             |    array(
             |      $lNew,
             |      shiftright($lNew - element_at(acc, 1) + element_at(acc, 2), 1)),
             |    slice(acc, 4, ${HwPeriod - 1}),
             |    array(shiftright(y * ${S}L - $lNew + element_at(acc, 3), 1))))"""
            .stripMargin.replace("\n", " ")).as("st"))
      .select($"user_id", $"n_days",
        expr("element_at(st, 1)").as("level_micro"),
        expr("element_at(st, 2)").as("trend_micro"),
        expr("element_at(st, 3)").as("season_next_micro"),
        expr("element_at(st, 1) + element_at(st, 2) + element_at(st, 3)")
          .as("forecast1_micro"))
      .orderBy($"user_id")
  }

  /** CUSUM calibration window: the user's first [[CusumTrainN]] purchases
    * set the in-control level μ (integer floor mean). */
  val CusumTrainN = 5
  /** Allowance κ = μ div [[CusumKDiv]] — the slack per step (half the
    * smallest shift worth detecting, in units of the user's own level). */
  val CusumKDiv = 4L
  /** Decision threshold h = [[CusumHMult]]·μ — self-scaling per user, so
    * no absolute cent constant anywhere. */
  val CusumHMult = 3L

  /** Per-user CUSUM change-point detection (Page 1954) — the sequential
    * drift test monitoring pipelines run per key: after calibrating μ on
    * the first [[CusumTrainN]] purchases, the one-sided cumulative sum
    * `S_i = max(0, S_{i−1} + x_i − μ − κ)` accumulates upward deviations;
    * the user is flagged at the first i where S_i > h. Unlike the
    * trailing-window spike test ([[anomaly]]) this detects SUSTAINED level
    * shifts — many small exceedances that no single window flags.
    * All arithmetic is exact integers (μ floor-mean, κ = μ div 4,
    * h = 3μ — self-scaling, no absolute threshold constant), so the fold
    * is bit-identical to the oracle's `list_reduce`. Output per user with
    * > TrainN purchases: n_obs, μ, max CUSUM statistic, and the 1-based
    * post-calibration index of the first breach (0 = in control).
    *
    * Shape at scale: the [[ewma]] sequential-fold shape — one (user)
    * shuffle into a per-row sorted array, the 4-field struct fold runs
    * entirely inside codegen'd array lambdas; no window exchange, no
    * corpus sort. */
  def cusum(s: SparkSession, dir: String): DataFrame =
    cusumOf(Tables.events(s, dir))

  /** [[cusum]] over any `(user_id, ts, event_type, value, event_id)`
    * events table — fixture entry point. */
  def cusumOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .filter($"event_type" === "purchase")
      // second-truncated fold order (shared with CusumStream — see ewmaOf)
      .select($"user_id", struct(date_trunc("second", $"ts").as("ts"),
        $"event_id", floor($"value" * 100).cast("long").as("x")).as("e"))
      .groupBy($"user_id")
      .agg(array_sort(collect_list($"e")).as("es"), count(lit(1)).as("n_obs"))
      .filter($"n_obs" > CusumTrainN)
      .withColumn("mu_cents", expr(
        s"aggregate(slice(es.x, 1, $CusumTrainN), 0L, (a, x) -> a + x) div $CusumTrainN"))
      .withColumn("st", expr(
        s"""aggregate(slice(es.x, ${CusumTrainN + 1}, size(es) - $CusumTrainN),
           |  named_struct('s', 0L, 'm', 0L, 'i', 0L, 'b', 0L),
           |  (acc, x) -> named_struct(
           |    's', greatest(0L, acc.s + x - mu_cents - (mu_cents div $CusumKDiv)),
           |    'm', greatest(acc.m,
           |      greatest(0L, acc.s + x - mu_cents - (mu_cents div $CusumKDiv))),
           |    'i', acc.i + 1L,
           |    'b', CASE WHEN acc.b > 0L THEN acc.b
           |      WHEN greatest(0L, acc.s + x - mu_cents - (mu_cents div $CusumKDiv))
           |        > $CusumHMult * mu_cents THEN acc.i + 1L
           |      ELSE 0L END))""".stripMargin.replace("\n", " ")))
      .select($"user_id", $"n_obs", $"mu_cents",
        $"st.m".as("s_max"), $"st.b".as("breach_at"))
      .orderBy($"user_id")
  }

  /** TIME-WEIGHTED average — the correct mean for an IRREGULAR series
    * (the financial TWAP / monitoring "average level" convention): each
    * purchase's cents value HOLDS from its event second until the next
    * purchase, so the average weights each value by its holding duration,
    * `twa = Σ(cents·dur_s) div Σ(dur_s)` — a plain count-mean would let
    * burst samples dominate a level held for days. The last observation
    * closes the integral (contributes no interval); users need ≥ 2
    * purchases. Exact integers throughout (epoch seconds × cents stay
    * far below 2^63 at any realistic span).
    *
    * Shape at scale: one (user) exchange; the lead window and the final
    * per-user aggregate ride the SAME partitioning (no second exchange
    * before the agg — the groupBy key equals the window partition key). */
  def twa(s: SparkSession, dir: String): DataFrame =
    twaOf(Tables.events(s, dir))

  /** [[twa]] over any `(user_id, ts, event_type, value, event_id)` events
    * table — fixture entry point. */
  def twaOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ord = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    events
      .filter($"event_type" === "purchase")
      .select($"user_id",
        unix_timestamp(date_trunc("second", $"ts")).as("ts_sec"),
        $"event_id", floor($"value" * 100).cast("long").as("cents"))
      .withColumn("dur_s", lead($"ts_sec", 1).over(ord) - $"ts_sec")
      .filter($"dur_s".isNotNull)
      .groupBy($"user_id")
      .agg((count(lit(1)) + 1L).as("n_obs"),
        sum($"dur_s").as("span_s"),
        expr("sum(cents * dur_s) div sum(dur_s)").as("twa_cents"))
      // all-in-one-second users have a zero-length integral — no level
      // to average (also guards the division)
      .filter($"span_s" > 0L)
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_gapfill" -> gapfill _,
    "q_ts_anomaly" -> anomaly _,
    "q_ts_ewma" -> ewma _,
    "q_ts_holt" -> holt _,
    "q_ts_holt_winters" -> holtWinters _,
    "q_ts_cusum" -> cusum _,
    "q_ts_twa" -> twa _,
  )

  val oracles: Map[String, String] = Map(
    "q_ts_gapfill" ->
      s"""WITH s AS (SELECT user_id, date_trunc('second', ts) AS ts,
         |    CAST(floor(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (SELECT user_id,
         |    time_bucket(INTERVAL '$BucketHours hours', ts) AS b,
         |    CAST(sum(vc) AS BIGINT) AS cents, count(*) AS n_obs
         |  FROM s GROUP BY 1, 2),
         |span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id,
         |    unnest(generate_series(b0, b1, INTERVAL '$BucketHours hours')) AS b
         |  FROM span),
         |j AS (SELECT g.user_id, g.b, o.cents, COALESCE(o.n_obs, 0) AS n_obs
         |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.b = g.b)
         |SELECT user_id, CAST(b AS TIMESTAMP) AS bstart,
         |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
         |  CAST(n_obs AS BIGINT) AS n_obs
         |FROM j ORDER BY user_id, bstart""".stripMargin,
    "q_ts_anomaly" ->
      s"""WITH s AS (SELECT user_id, date_trunc('second', ts) AS ts,
         |    CAST(floor(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (SELECT user_id,
         |    time_bucket(INTERVAL '$BucketHours hours', ts) AS b,
         |    CAST(sum(vc) AS BIGINT) AS cents
         |  FROM s GROUP BY 1, 2),
         |span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id,
         |    unnest(generate_series(b0, b1, INTERVAL '$BucketHours hours')) AS b
         |  FROM span),
         |j AS (SELECT g.user_id, g.b, COALESCE(o.cents, 0) AS cents
         |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.b = g.b),
         |t AS (SELECT user_id, b, cents,
         |    CAST(COALESCE(sum(cents) OVER (PARTITION BY user_id ORDER BY b
         |      ROWS BETWEEN $TrailN PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tsum,
         |    count(*) OVER (PARTITION BY user_id ORDER BY b
         |      ROWS BETWEEN $TrailN PRECEDING AND 1 PRECEDING) AS tn
         |  FROM j)
         |SELECT user_id, CAST(b AS TIMESTAMP) AS bstart, cents, tsum
         |FROM t WHERE tn = $TrailN AND cents > 0 AND cents * $TrailN > $SpikeMult * tsum
         |ORDER BY user_id, bstart""".stripMargin,
    // the same scaled integer fold: list_reduce seeds from the first
    // element (already scaled), each step floor-divides — bit-identical
    // to the Spark aggregate() lambda
    "q_ts_ewma" ->
      s"""WITH s AS (SELECT user_id, date_trunc('second', ts) AS ts, event_id,
         |    CAST(floor(value * 100) AS BIGINT) * $EwmaScale AS x
         |  FROM events WHERE event_type = 'purchase'),
         |l AS (SELECT user_id, list(x ORDER BY ts, event_id) AS xs,
         |    count(*) AS n_obs
         |  FROM s GROUP BY 1)
         |SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
         |  CAST(list_reduce(xs, (acc, x) ->
         |    (x + ${EwmaDen - 1L} * acc) // $EwmaDen) AS BIGINT) AS ewma_micro,
         |  CAST(xs[len(xs)] // $EwmaScale AS BIGINT) AS last_cents
         |FROM l ORDER BY user_id""".stripMargin,
    // the identical shift-floored Holt–Winters recursion: the same daily
    // grid, a 9-slot [l, b, s1..s7] LIST accumulator with head-seasonal
    // rotation (textual re-inlining of l_new is oracle-scale-fine)
    "q_ts_holt_winters" -> {
      val lNew = s"(e[1] * $EwmaScale - acc[3] + acc[1] + acc[2]) >> 1"
      s"""WITH s AS (SELECT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         |    CAST(floor(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (SELECT user_id, d, CAST(sum(vc) AS BIGINT) AS cents
         |  FROM s GROUP BY 1, 2),
         |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS d FROM span),
         |j AS (SELECT g.user_id, g.d, COALESCE(o.cents, 0) AS y
         |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.d = g.d),
         |l AS (SELECT user_id, list(y ORDER BY d) AS ys, count(*) AS n_days
         |  FROM j GROUP BY 1),
         |f AS (SELECT user_id, n_days,
         |    list_reduce(
         |      list_prepend(
         |        CAST([ys[1] * $EwmaScale, 0, 0, 0, 0, 0, 0, 0, 0] AS BIGINT[]),
         |        list_transform(ys[2:], y -> CAST([y] AS BIGINT[]))),
         |      (acc, e) -> list_concat(list_concat(
         |        [$lNew, (($lNew) - acc[1] + acc[2]) >> 1],
         |        acc[4:${2 + HwPeriod}]),
         |        [(e[1] * $EwmaScale - ($lNew) + acc[3]) >> 1])) AS st
         |  FROM l)
         |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
         |  CAST(st[1] AS BIGINT) AS level_micro,
         |  CAST(st[2] AS BIGINT) AS trend_micro,
         |  CAST(st[3] AS BIGINT) AS season_next_micro,
         |  CAST(st[1] + st[2] + st[3] AS BIGINT) AS forecast1_micro
         |FROM f ORDER BY user_id""".stripMargin
    },
    // the identical shift-floored Holt recursion over the zero-filled
    // daily grid, folded with a LIST accumulator [l, b] (struct
    // accumulators mis-evaluate on DuckDB 1.0; list ones are sound)
    "q_ts_holt" ->
      s"""WITH s AS (SELECT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         |    CAST(floor(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (SELECT user_id, d, CAST(sum(vc) AS BIGINT) AS cents
         |  FROM s GROUP BY 1, 2),
         |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS d FROM span),
         |j AS (SELECT g.user_id, g.d, COALESCE(o.cents, 0) AS y
         |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.d = g.d),
         |l AS (SELECT user_id, list(y ORDER BY d) AS ys, count(*) AS n_days
         |  FROM j GROUP BY 1),
         |f AS (SELECT user_id, n_days,
         |    list_reduce(
         |      list_prepend(CAST([ys[1] * $EwmaScale, 0] AS BIGINT[]),
         |        list_transform(ys[2:], y -> CAST([y, 0] AS BIGINT[]))),
         |      (acc, e) -> [
         |        (e[1] * $EwmaScale + acc[1] + acc[2]) >> 1,
         |        (((e[1] * $EwmaScale + acc[1] + acc[2]) >> 1) - acc[1] + acc[2]) >> 1
         |      ]) AS lb
         |  FROM l)
         |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
         |  CAST(lb[1] AS BIGINT) AS level_micro,
         |  CAST(lb[2] AS BIGINT) AS trend_micro,
         |  CAST(lb[1] + 7 * lb[2] AS BIGINT) AS forecast7_micro
         |FROM f ORDER BY user_id""".stripMargin,
    // an INDEPENDENT formulation of the same statistic, not a replay of
    // the fold: the recursion S_i = max(0, S_{i−1} + d_i) has the closed
    // form S_i = P_i − min(0, min_{j≤i} P_j) with P the prefix sum of
    // d = x − μ − κ, so the oracle computes it with window functions —
    // equality proves the Spark fold AND the closed form agree.
    // (A struct-accumulator list_reduce replay mis-evaluates on DuckDB
    // 1.0.0 — multi-field lambda accumulators return wrong field values.)
    "q_ts_cusum" ->
      s"""WITH s AS (SELECT user_id, date_trunc('second', ts) AS ts, event_id,
         |    CAST(floor(value * 100) AS BIGINT) AS x
         |  FROM events WHERE event_type = 'purchase'),
         |l AS (SELECT user_id, list(x ORDER BY ts, event_id) AS xs,
         |    count(*) AS n FROM s GROUP BY 1),
         |m AS (SELECT user_id, n,
         |    CAST(list_sum(xs[1:$CusumTrainN]) AS BIGINT) // $CusumTrainN AS mu,
         |    xs[${CusumTrainN + 1}:] AS rest
         |  FROM l WHERE n > $CusumTrainN),
         |u AS (SELECT user_id, n, mu, generate_subscripts(rest, 1) AS i,
         |    unnest(rest) AS x FROM m),
         |p AS (SELECT user_id, n, mu, i,
         |    sum(x - mu - mu // $CusumKDiv)
         |      OVER (PARTITION BY user_id ORDER BY i) AS ps FROM u),
         |c AS (SELECT user_id, n, mu, i,
         |    ps - LEAST(0, min(ps) OVER (PARTITION BY user_id ORDER BY i)) AS sc
         |  FROM p)
         |SELECT user_id, CAST(any_value(n) AS BIGINT) AS n_obs,
         |  any_value(mu) AS mu_cents, CAST(max(sc) AS BIGINT) AS s_max,
         |  CAST(COALESCE(min(CASE WHEN sc > $CusumHMult * mu THEN i END), 0)
         |    AS BIGINT) AS breach_at
         |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same holding-interval integral: value holds until the next purchase
    // second, floor-divided duration-weighted mean. epoch() returns
    // DOUBLE in DuckDB — cast to BIGINT immediately or the
    // duration-weighted sum picks up float error and floors wrong
    "q_ts_twa" ->
      s"""WITH s AS (SELECT user_id,
         |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec, event_id,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |d AS (SELECT user_id, cents,
         |    lead(ts_sec) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) - ts_sec AS dur_s
         |  FROM s)
         |SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_obs,
         |  CAST(sum(dur_s) AS BIGINT) AS span_s,
         |  CAST(sum(cents * dur_s) // sum(dur_s) AS BIGINT) AS twa_cents
         |FROM d WHERE dur_s IS NOT NULL
         |GROUP BY user_id HAVING sum(dur_s) > 0
         |ORDER BY user_id""".stripMargin,
  )
}
