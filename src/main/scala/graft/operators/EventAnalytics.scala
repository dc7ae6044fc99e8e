package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event log (SURVEY §2.B event
  * family): ordered funnel conversion, cohort retention, and time-series
  * resampling with forward fill. All three are shapes every large event
  * warehouse query engine ships natively; here they compose from
  * hash aggregation + higher-order array functions so the heavy pass
  * stays inside whole-stage codegen.
  */
object EventAnalytics {

  /** Default per-key series-length bound for the sequence-fold family
    * (funnel/ewma/holt). A gathered series lives in ONE aggregation-
    * buffer row; at ~24–32 bytes/element 1M elements is a ~30 MB row —
    * near the practical per-row ceiling before a task OOMs. Operators
    * take this as a parameter so callers with known-hot keys can raise
    * or lower it deliberately. */
  val DefaultMaxSeriesLength: Int = 1000000

  /** ENFORCED series-fits-one-row bound (round-7 verdict #1): every
    * per-key sequence fold gathers a key's full series via
    * `sort_array(collect_list(...))` — the right shape for a linear
    * recurrence, but a hot key (a bot user at 100 TB) would otherwise
    * silently build a giant row and OOM the task. This guard turns that
    * silent death into a loud, actionable analysis error naming the key
    * and the fix — the same fail-fast protocol as the minhash-index
    * width guard (Dedup.incrementalNearDups). One `size` comparison per
    * key, evaluated inside the same codegen stage as the fold. */
  private def boundedSeries(seq: Column, keyC: Column, maxLen: Int,
                            op: String): Column = {
    require(maxLen > 0, s"$op: maxSeriesLength must be positive, got $maxLen")
    when(size(seq) <= maxLen, seq).otherwise(raise_error(concat(
      lit(s"$op: per-key series for key "), keyC.cast("string"),
      lit(" has "), size(seq).cast("string"),
      lit(s" events, exceeding maxSeriesLength=$maxLen — raise the bound, " +
        "pre-aggregate the series into buckets, or drop/sample the hot key"))))
  }

  /** Ordered funnel: for each user, the earliest chain of `steps`
    * events where step i+1 happens at-or-after the reached step i and
    * (optionally) within `maxGap` of it; output is users reached per
    * step.
    *
    * Shape at scale: filter to the step set (pushed to the scan),
    * ONE shuffle on the user key into a hash aggregate whose value is
    * the user's sorted (ts, step) array, then the chain fold runs as a
    * higher-order `aggregate` over that array — a narrow codegen pass,
    * no window, no per-step self-join (the naive form is k-1 joins over
    * the full log). The final per-step counts are a two-row global agg.
    * Equal timestamps break ties by step order, so a step-i and step-i+1
    * event on the same instant chain in order.
    */
  def funnelReach(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  maxGap: Option[String] = None,
                  maxSeriesLength: Int = DefaultMaxSeriesLength): DataFrame = {
    require(steps.size >= 2, "funnelReach: need at least 2 steps")
    require(steps.distinct.size == steps.size, "funnelReach: steps must be distinct")
    val k = steps.size
    // 0-based step index; array_position is 1-based and 0 = absent
    val idxOf = (array_position(lit(steps.toArray), col(typeCol)) - 1).cast("int")
    val perUser = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("u"),
        struct(col(tsCol).as("ts"), idxOf.as("idx")).as("e"))
      .groupBy(col("u"))
      .agg(boundedSeries(sort_array(collect_list(col("e"))), col("u"),
        maxSeriesLength, "funnelReach").as("evs"))
    val init = array((0 until k).map(_ => lit(null).cast("timestamp")): _*)
    val reach = aggregate(col("evs"), init, (acc: Column, e: Column) => {
      val idx = e.getField("idx")
      val ets = e.getField("ts")
      // previous step reached, and (if gapped) this event inside its
      // window. element_at is 1-based, so element_at(acc, idx) IS the
      // 0-based predecessor; the CASE keeps it unevaluated when idx=0
      // (ANSI element_at(_, 0) would throw).
      val prevOk = when(idx === 0, lit(true)).otherwise(maxGap match {
        case None      => element_at(acc, idx).isNotNull
        case Some(gap) => element_at(acc, idx).isNotNull &&
          ets <= element_at(acc, idx) + expr(s"INTERVAL $gap")
      })
      // events arrive in (ts, idx) order, so the first qualifying event
      // per step is the minimal one — greedy fold == per-step min chain
      transform(acc, (t: Column, i: Column) =>
        when(i === idx && t.isNull && prevOk, ets).otherwise(t))
    })
    val cnts = (0 until k).map(i =>
      sum(when(col("reach").getItem(i).isNotNull, 1L).otherwise(0L)).as(s"s$i"))
    perUser.select(reach.as("reach"))
      .agg(cnts.head, cnts.tail: _*)
      .select(explode(array((0 until k).map(i => struct(
        lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
        col(s"s$i").as("users"))): _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.users"))
      .orderBy("step")
  }

  /** Cohort retention: cohort = the day of a user's first qualifying
    * event; for each (cohort, day offset), how many of that cohort's
    * users were active. Two hash aggregates plus one join whose right
    * side is one row per user — tiny next to the event log, so at scale
    * the join is on pre-aggregated data, never raw events; countDistinct
    * is avoided because (user, day) is distinct by construction.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .groupBy("u", "d").agg(count(lit(1)).as("_n")).drop("_n")
    val first = days.groupBy("u").agg(min(col("d")).as("cohort"))
    days.join(first, "u")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort", "day_offset")
  }

  /** Resample + forward fill: aggregate per (key, time bucket), build
    * the complete bucket grid between the global min and max bucket,
    * and forward-fill (LOCF) empty buckets from the last observed value
    * per key. Buckets before a key's first observation stay null.
    *
    * Shape at scale: the ONLY pass over raw events is the partial-agged
    * bucket aggregate; the grid is |keys| × |buckets| rows (tiny by
    * comparison), built from a 1-row bounds agg cross-joined with the
    * distinct keys, and the fill window runs per key over that grid.
    */
  def resampleFill(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: Column, bucket: String = "hour"): DataFrame = {
    val actual = events
      .groupBy(col(keyCol).as("k"), date_trunc(bucket, col(tsCol)).as("h"))
      .agg(valCol.as("v"))
    val bounds = actual.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val grid = actual.select(col("k")).distinct()
      .crossJoin(bounds)
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"), expr(s"INTERVAL 1 $bucket"))).as("h"))
    grid.join(actual, Seq("k", "h"), "left")
      .withColumn("filled", col("v").isNull)
      .withColumn("v", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy("k").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("k", "h")
  }

  /** CUSUM change-point detection per key: bucket the series (hourly
    * by default, decimal-exact sums), then the classic cumulative-sum
    * statistic S_k = Σ_{i≤k} (x_i − x̄) — the bucket where |S| peaks is
    * the most likely single change point, and the peak magnitude is
    * the shift evidence (flat series ⇒ S wanders near 0). The raw
    * pass is ONE partial-agged bucket aggregate; the CUSUM window runs
    * over the |keys|×|buckets| series table, tiny by comparison.
    * Returns (key, change_at, peak_s, n_buckets).
    *
    * Determinism: bucket sums are exact decimals; the mean and the
    * prefix sums are computed in FIXED bucket order, so both engines
    * fold the identical doubles in the identical order — replayable
    * without tolerance.
    */
  def cusumChangePoint(events: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, bucket: String = "hour"): DataFrame = {
    // persist the series: it feeds BOTH the means and the CUSUM branch
    // — without it Spark recomputes the raw bucket pass twice (two
    // full scans of events at 100 TB). The tiny result materializes
    // via localCheckpoint so the cache is released on return (the
    // minhashPairs lifecycle pattern).
    val series = events
      .groupBy(col(keyCol).as("k"), date_trunc(bucket, col(tsCol)).as("h"))
      .agg(sum(col(valCol).cast("decimal(18,4)")).cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val means = series.groupBy(col("k"))
      .agg((sum(col("x").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("mean"), count(lit(1)).as("n_buckets"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("h"))
    val cusum = series.join(broadcast(means), Seq("k"))
      .withColumn("s", sum(col("x") - col("mean")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val best = Window.partitionBy(col("k"))
      .orderBy(abs(col("s")).desc, col("h"))
    val out = cusum.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("k"), col("h").as("change_at"),
        abs(col("s")).as("peak_s"), col("n_buckets"))
    val materialized = out.localCheckpoint(true)
    series.unpersist()
    materialized
  }

  /** Time-weighted average per key (TWAP) — the metrics/finance mean
    * that weights each observation by how long it REMAINED the current
    * value: Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δtᵢ the micros to the next
    * observation (the last observation has no interval and drops;
    * single-observation keys produce no row). One shuffle on the key
    * (lead window), then a partial-agged sum.
    *
    * Exactness: vᵢ·Δtᵢ terms are DECIMAL(18,4)·DECIMAL(14,0) products
    * (µs gaps to ~3 years fit 14 digits) summed as decimal — exact in
    * any aggregation order, so the one final double division is the
    * only float op and the result replays cross-engine.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(valCol).cast("decimal(18,4)").as("__v"),
        unix_micros(col(tsCol)).as("__t"))
      .withColumn("__dt", lead(col("__t"), 1).over(w) - col("__t"))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__v") * col("__dt").cast("decimal(14,0)")).as("__sw"),
        sum(col("__dt")).as("__tw"))
      .select(col(keyCol), col("n_intervals"),
        (col("__sw").cast("double") / col("__tw").cast("double")).as("twap"))
  }

  /** Exponentially weighted moving average per entity — the recency-
    * biased smoothing a metrics pipeline keeps per user/device
    * (y_i = α·x_i + (1−α)·y_{i−1}, y_1 = x_1). A linear RECURRENCE,
    * not a frame aggregate, so no window frame expresses it; instead
    * each entity's series is gathered once (one hash-agg shuffle into
    * a sorted array — same per-key-sequence shape as the funnel fold)
    * and the recurrence folds left inside codegen via the higher-order
    * `aggregate`. Per-key series must fit one row — ENFORCED by the
    * [[boundedSeries]] fail-fast guard (`maxSeriesLength`); α and 1−α are
    * passed as two separate literals (deriving one from the other at
    * SQL-text level risks a one-ulp constant mismatch cross-engine).
    *
    * Returns (key, n, ewma) — the series length and the final
    * smoothed value. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valCol: String, alpha: Double,
           maxSeriesLength: Int = DefaultMaxSeriesLength): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewma: alpha $alpha outside (0,1]")
    val a = lit(alpha)
    val b = lit(1.0 - alpha)
    events.groupBy(col(keyCol))
      .agg(boundedSeries(sort_array(collect_list(struct(col(tsCol), col(tieCol),
        col(valCol).cast("double").as("v")))), col(keyCol),
        maxSeriesLength, "ewma").as("seq"))
      .select(col(keyCol), size(col("seq")).as("n"),
        aggregate(transform(col("seq"), x => x.getField("v")),
          lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x).otherwise(a * x + b * acc)).as("ewma"))
  }

  /** Holt double-exponential smoothing per entity — EWMA plus a TREND
    * state, the classic short-horizon forecaster:
    *   l' = α·x + (1−α)(l + b);  b' = β(l' − l) + (1−β)b
    * with l₁ = x₁, b₁ = 0. Same per-key sorted-array fold shape as
    * [[ewma]] (one hash-agg shuffle, the recurrence runs in codegen),
    * with a STRUCT accumulator carrying (level, trend). The lambda
    * references only the accumulator, the element and LITERAL
    * constants — never an outer attribute (the binding-bug class
    * adjudicated in INCIDENTS.md R7-1). All four α/β constants pass as
    * separate literals; outputs ship UNROUNDED (both engines fold the
    * identical doubles in the identical order — bit-identical, and a
    * display round would reintroduce midpoint divergence).
    *
    * Returns (key, n, level, trend, forecast = level + trend). */
  def holtSmoothing(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valCol: String,
                    alpha: Double, beta: Double,
                    maxSeriesLength: Int = DefaultMaxSeriesLength): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"holt: alpha $alpha outside (0,1]")
    require(beta >= 0 && beta <= 1, s"holt: beta $beta outside [0,1]")
    val a = lit(alpha); val oa = lit(1.0 - alpha)
    val bb = lit(beta); val ob = lit(1.0 - beta)
    val stT = "struct<l:double,b:double>"
    events.groupBy(col(keyCol))
      .agg(boundedSeries(sort_array(collect_list(struct(col(tsCol), col(tieCol),
        col(valCol).cast("double").as("v")))), col(keyCol),
        maxSeriesLength, "holtSmoothing").as("seq"))
      .select(col(keyCol), size(col("seq")).as("n"),
        aggregate(transform(col("seq"), x => x.getField("v")),
          lit(null).cast(stT),
          (acc, x) => when(acc.isNull,
            struct(x.as("l"), lit(0.0).as("b")))
            .otherwise {
              // b' in the ALGEBRAIC form β·(α·(x−l)+(1−α)·b)+(1−β)·b —
              // equal to β(l'−l)+(1−β)b in the reals but with no
              // reference to l': DuckDB's struct-literal lambda
              // rebinds acc.l to the new field before evaluating b
              // (sequential-update semantics, adjudicated in
              // INCIDENTS.md R7-2), so the oracle folds LIST state and
              // both engines must run these exact double ops
              struct(
                (a * x + oa * (acc.getField("l") + acc.getField("b"))).as("l"),
                (bb * (a * (x - acc.getField("l")) + oa * acc.getField("b"))
                  + ob * acc.getField("b")).as("b"))
            }).as("st"))
      .select(col(keyCol), col("n"),
        col("st.l").as("level"), col("st.b").as("trend"),
        (col("st.l") + col("st.b")).as("forecast"))
  }

  /** Rolling z-score anomaly detection per key: bucket the series
    * (hourly by default, decimal-exact sums), then score each bucket
    * against the mean/stddev of its TRAILING `lookback` buckets
    * (current bucket excluded — the score is "how far from my own
    * recent history", the on-call metrics-page statistic). Only buckets
    * with a FULL lookback window and positive variance are scored;
    * returned is each key's single most anomalous bucket
    * (key, bucket_ts, z, n_scored) — peak-selection like
    * [[cusumChangePoint]], threshold-free so the output carries no
    * boundary sensitivity.
    *
    * Shape at scale: the only pass over raw events is the partial-agged
    * bucket aggregate; the rolling window runs over the
    * |keys|×|buckets| series table (tiny by comparison) with a
    * bounded ROWS frame. z is rounded to 4 (absorbs the window
    * aggregate's cross-engine summation-order ulp).
    */
  def rollingAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, bucket: String = "hour",
                     lookback: Int = 24): DataFrame = {
    require(lookback >= 2, s"rollingAnomaly: lookback $lookback must be >= 2")
    val series = events
      .groupBy(col(keyCol).as("k"), date_trunc(bucket, col(tsCol)).as("h"))
      .agg(sum(col(valCol).cast("decimal(18,4)")).cast("double").as("x"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("h"))
    val trail = wOrd.rowsBetween(-lookback, -1)
    val scored = series
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("mu", avg(col("x")).over(trail))
      .withColumn("sd", stddev_samp(col("x")).over(trail))
      .filter(col("rn") > lookback && col("sd") > 0)
      .withColumn("z", (col("x") - col("mu")) / col("sd"))
    val best = Window.partitionBy(col("k"))
      .orderBy(abs(col("z")).desc, col("h"))
    scored
      .withColumn("n_scored", count(lit(1)).over(Window.partitionBy(col("k"))))
      .withColumn("pick", row_number().over(best))
      .filter(col("pick") === 1)
      .select(col("k"), col("h").as("bucket_ts"),
        round(col("z"), 4).as("z"), col("n_scored"))
  }

  /** First-order Markov transition matrix of the event-type sequence:
    * per (from, to) pair, the transition count and probability
    * P(to | from) — the behavioral-model summary (next-step
    * prediction, anomalous-path detection) of an event log.
    *
    * Shape at scale: ONE shuffle on the entity key into a per-entity
    * window (`lag`), then the (from, to) counts partial-agg map-side;
    * the probability normalizer is a broadcast-joined per-`from` total
    * over the |types|² count table — never a second pass over events.
    * `tieCol` breaks equal-timestamp ordering so the sequence is
    * deterministic.
    */
  def transitionMatrix(events: DataFrame, entityCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(entityCol), col(typeCol).as("to_type"), col(tsCol), col(tieCol))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("cnt")).as("tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        (col("cnt").cast("double") / col("tot")).as("p"))
  }
}
