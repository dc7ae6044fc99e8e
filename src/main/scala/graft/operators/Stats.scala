package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analysis operators: per-group OLS regression, pairwise
  * correlation matrices, and a two-sample Kolmogorov-Smirnov test —
  * the model-the-data half of a profiling suite (distribution drift,
  * linear trend extraction, feature redundancy checks before a
  * training run).
  *
  * Scale notes:
  *   - [[olsByGroup]] and [[corrMatrix]] are single hash-aggregation
  *     passes built from Spark's declarative regr_* / corr aggregates —
  *     map-side partials, no second scan, no windows.
  *   - [[ksTest]] needs a GLOBAL cumulative distribution, which the
  *     naive `Window.orderBy(value)` form serializes through ONE task.
  *     Here the CDF is computed with a bucketed prefix sum
  *     ([[bucketedCdf]]): approx-quantile boundaries split the value
  *     line into ~`buckets` ranges, each bucket cumsums locally
  *     (shuffle keyed on bucket id), and the per-bucket totals — one
  *     row per bucket — cascade through a tiny single-partition window
  *     whose output broadcasts back. Exact results (bucket imbalance
  *     only skews task sizes, never sums), no single-task scan of the
  *     data.
  *
  * EAGER-MATERIALIZATION CONTRACT (bucketed prefix-sum family: ksTest /
  * mannWhitneyU / psi / paretoCurve / equiDepthBins): these methods run
  * Spark jobs AT CALL TIME (a sampled approxQuantile for boundaries
  * and/or a planning-sized collect of per-bucket totals), and the
  * DataFrame they return re-scans the input at action time. The input
  * must therefore be STABLE between the call and the action — true for
  * the immutable parquet snapshots this engine reads; for a mutable or
  * churning source, `localCheckpoint()` the input first so the frozen
  * offsets and the re-scan see identical data.
  *
  * NULL POLICY: KS / Mann-Whitney / PSI are statistics of OBSERVED
  * values — rows whose value column is NULL are excluded up front
  * (also keeps both engines agnostic to NULLS FIRST/LAST ordering,
  * which differs between Spark and DuckDB).
  */
object Stats {

  /** Per-group simple linear regression y = a·x + b via Spark's
    * declarative regression aggregates (one codegen hash-agg pass):
    * slope, intercept, Pearson r², and the point count per group.
    * Rows where either side is null are excluded (regr_* semantics).
    */
  def olsByGroup(df: DataFrame, groupCol: String, yCol: String,
                 xCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(
        regr_count(y, x).as("n"),
        regr_slope(y, x).as("slope"),
        regr_intercept(y, x).as("intercept"),
        regr_r2(y, x).as("r2"))
  }

  /** Pairwise Pearson correlations for every unordered column pair, in
    * long form `(col_a, col_b, r)` with col_a < col_b. ONE aggregation
    * pass computes all C(n,2) coefficients as separate agg columns;
    * the unpivot to long form runs over the single result row.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      corr(col(a).cast("double"), col(b).cast("double")).as(s"${a}__$b")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) => s"'$a', '$b', `${a}__$b`" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, r)")
  }

  /** Bucket id for a value column given sorted boundaries: the count
    * of boundaries <= v, as a PLAIN sum of when-expressions. NOT the
    * `aggregate()` higher-order form: a lambda capturing an outer
    * attribute trips a Spark 4.1 binding bug
    * (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) when the bucketed frame
    * feeds a join under certain AQE partition counts — chained whens
    * codegen identically and capture nothing. */
  private[operators] def bucketExpr(bounds: Array[Double],
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bounds.map(bd => when(lit(bd) <= v, 1).otherwise(0))
      .reduce(_ + _)

  /** Approximate bucket boundaries for the prefix-sum operators, from
    * a 10% SAMPLE of the frame: boundary accuracy only balances task
    * sizes — correctness never depends on it — so the boundary pass
    * should cost a fraction of a scan, not a full one (measured: the
    * full-frame approxQuantile was ~40% of x_eqdepth's wall-clock).
    * Empty or degenerate samples yield no boundaries → callers fall
    * back to a single bucket, which is still correct. Seeded, so plans
    * are reproducible run-to-run. */
  private[operators] def approxBounds(df: DataFrame, colName: String, buckets: Int): Array[Double] = {
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    if (qs.isEmpty) Array.empty[Double]
    else try df.sample(withReplacement = false, 0.1, seed = 42L)
      .stat.approxQuantile(colName, qs, 0.01)
      .filterNot(_.isNaN)
    catch { case _: NoSuchElementException => Array.empty[Double] }
  }

  /** Exact global CDF of both samples at every distinct value, via the
    * bucketed prefix sum described in the object scaladoc. Returns one
    * row per distinct value of `valueCol` with cumulative counts
    * `ca`/`cb` of rows in sample A (`sampleACond` true) and sample B.
    */
  private[operators] def bucketedCdf(df: DataFrame, valueCol: String,
      sampleACond: org.apache.spark.sql.Column,
      buckets: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    // observed values only (object scaladoc NULL POLICY): a NULL would
    // otherwise become its own CDF point whose position depends on the
    // engine's null-ordering convention
    val observed = df.filter(col(valueCol).isNotNull)
    // per-distinct-value counts: collapses ties BEFORE any ordering, so
    // tie handling is exact and the cumsum input is |distinct values|
    val counts = observed
      .groupBy(v.as("v"))
      .agg(sum(when(sampleACond, 1L).otherwise(0L)).as("na"),
        sum(when(sampleACond, 0L).otherwise(1L)).as("nb"))
    // approx bucket boundaries — correctness does not depend on them
    // (an empty or lopsided boundary set only skews task sizes);
    // bucket id = count of boundaries <= v, monotone in v
    val bounds = approxBounds(counts, "v", buckets)
    val withB =
      if (bounds.isEmpty) counts.withColumn("b", lit(0))
      else counts.withColumn("b", bucketExpr(bounds, col("v")))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB
      .withColumn("la", sum(col("na")).over(inBucket))
      .withColumn("lb", sum(col("nb")).over(inBucket))
    // per-bucket totals are ≤ buckets rows: fold them to strictly-
    // earlier-bucket offsets ON THE DRIVER (a planning-sized collect,
    // the ZoneMaps.pruneFiles pattern) and join back a literal frame.
    // The previous offsets-over-a-window-of-the-same-lineage plan hit
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under some AQE partition
    // counts (Spark 4.1 binding bug with a shared Exchange between the
    // window branch and its re-aggregation); a literal frame has no
    // shared lineage to mis-bind.
    val totals = withB.groupBy(col("b"))
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      .collect().sortBy(_.getInt(0))
    var accA = 0L; var accB = 0L
    val offRows = totals.map { r =>
      val row = (r.getInt(0), accA, accB)
      accA += r.getLong(1); accB += r.getLong(2)
      row
    }.toSeq
    val session = df.sparkSession
    import session.implicits._
    val offsets = offRows.toDF("b", "oa", "ob")
    local.join(broadcast(offsets), Seq("b"))
      .select(col("v"), (col("la") + col("oa")).as("ca"),
        (col("lb") + col("ob")).as("cb"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the rows where
    * `sampleACond` holds and the rest: D = sup_x |F_A(x) - F_B(x)|,
    * evaluated at every distinct value (where the sup is attained).
    * One row out: (n_a, n_b, d). The caller rounds for cross-engine
    * comparison; D is a ratio of exact integer counts.
    */
  def ksTest(df: DataFrame, valueCol: String,
             sampleACond: org.apache.spark.sql.Column,
             buckets: Int = 32): DataFrame = {
    val cdf = bucketedCdf(df, valueCol, sampleACond, buckets)
    val totals = broadcast(cdf.agg(max(col("ca")).as("n_a"), max(col("cb")).as("n_b")))
    cdf.crossJoin(totals)
      .select(col("n_a"), col("n_b"),
        abs(col("ca") / col("n_a") - col("cb") / col("n_b")).as("diff"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("diff")).as("d"))
  }

  /** Exact type-1 (order-statistic) quantiles with BOUNDED memory —
    * the 100 TB-safe counterpart of Spark's `percentile`, which
    * buffers every group value in one aggregation buffer and cannot
    * survive a hot group. Rank k(p) = ⌈p·n⌉ (IEEE double product on
    * both engines, so the index is deterministic cross-engine even at
    * a representation boundary) and the quantile is the smallest
    * distinct value whose exact cumulative count reaches k — read off
    * the bucketed prefix sum ([[globalCum]]): per-distinct-value
    * counts (one partial-agged shuffle, PERSISTED so the boundary
    * sample, the bucket-total fold, and the rank probe pay ONE corpus
    * scan between them), local cumsums per bucket, planning-sized
    * driver fold of ≤ `buckets` bucket totals. The rank probe
    * broadcasts the |ps|-row rank frame against the distinct-value CDF
    * (one narrow pass, partial-agged MIN) — nothing corpus-sized is
    * ever sorted, buffered, or collected. Returns a LITERAL frame
    * `(p, k, n, value)` (|ps| rows — planning-sized by construction,
    * collected at call time so consumers embed it as a broadcast
    * literal instead of re-deriving the CDF per action); the
    * eager-materialization contract (object scaladoc) applies. NULLs
    * are excluded (observed values only, the [[bucketedCdf]] policy);
    * `ps` must lie in (0, 1]; empty input → empty frame.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                     buckets: Int = 32): DataFrame = {
    require(ps.nonEmpty, "exactQuantiles: need at least one quantile")
    require(ps.forall(p => p > 0.0 && p <= 1.0),
      s"exactQuantiles: quantiles must be in (0, 1], got $ps")
    val session = df.sparkSession
    import session.implicits._
    val (cum, n, cached) = globalCum(df, valueCol, buckets)
    if (n == 0L) {
      cached.unpersist()
      return Seq.empty[(Double, Long, Long, Double)].toDF("p", "k", "n", "value")
    }
    // rank frame on the driver from the fold's total: k = ⌈p·n⌉ as an
    // IEEE double product — the oracle's expression
    val ranks = ps.map(p =>
      (p, math.max(1L, math.ceil(p * n.toDouble).toLong), n)).toDF("p", "k", "n")
    // rank probe: broadcast-nested-loop against the cached CDF,
    // partial-agged min — linear in |distinct values|, no sort
    val rows = cum.join(broadcast(ranks), col("cum") >= col("k"))
      .groupBy(col("p"), col("k"), col("n"))
      .agg(min(col("v")).as("value"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    cached.unpersist()
    rows.sortBy(_._1).toSeq.toDF("p", "k", "n", "value")
  }

  /** Shared global machinery of the quantile family ([[groupedCum]]'s
    * ungrouped sibling): exact cumulative counts per distinct value.
    * The per-distinct-value counts frame is PERSISTED (MEMORY_AND_DISK
    * — it is |distinct values|-sized, the legitimate intermediate; the
    * boundary sample fills the cache, so the fold and the caller's
    * probe re-read it instead of re-scanning the corpus) and returned
    * as the third element for the CALLER to unpersist after its probe
    * action. Returns (cum frame `(v double, cum long)`, total observed
    * count from the same fold, cached counts handle).
    */
  private def globalCum(df: DataFrame, valueCol: String,
                        buckets: Int): (DataFrame, Long, DataFrame) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = col(valueCol).cast("double")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(v.as("v")).agg(count(lit(1)).as("c"))
      .persist(lvl)
    val bounds = approxBounds(counts, "v", buckets)
    val withB =
      if (bounds.isEmpty) counts.withColumn("b", lit(0))
      else counts.withColumn("b", bucketExpr(bounds, col("v")))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("v"))
    val local = withB.withColumn("lc", sum(col("c")).over(inBucket))
    // driver-folded offsets over ≤ buckets rows (bucketedCdf's
    // literal-frame pattern, same lineage-binding rationale)
    val totals = withB.groupBy(col("b")).agg(sum(col("c")).as("tc"))
      .collect().sortBy(_.getInt(0))
    var acc = 0L
    val offRows = totals.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toSeq
    val session = df.sparkSession
    import session.implicits._
    val cum =
      if (offRows.isEmpty) local.select(col("v"), col("lc").as("cum"))
      else local.join(broadcast(offRows.toDF("b", "off")), Seq("b"))
        .select(col("v"), (col("lc") + col("off")).as("cum"))
    (cum, acc, counts)
  }

  /** Per-group [[exactQuantiles]] — the scale-safe replacement for
    * `percentile(...) GROUP BY g`, whose aggregation buffer holds
    * every value of the hottest group (the 100 TB cliff winsorizedStats
    * documents). Same machinery, partitioned by group: per-(group,
    * distinct value) counts, per-(group, bucket) local cumsums, then a
    * DRIVER fold of the (group, bucket) totals — planning-sized for
    * real grouping keys (languages, sources, flags) and guarded by
    * `maxFoldRows` (fail loud, never a silent giant collect). Rank
    * k = ⌈p·n_g⌉ per group under the same IEEE double product as the
    * oracle. Returns `(groupCol, p, k, n, value)` — the group key is
    * carried as its STRING rendering (the driver fold and the literal
    * rank frame need one concrete type; cast back at the call site if
    * a numeric key must round-trip). NULL values and NULL group keys
    * are both excluded (observed-values policy; cross-engine
    * null-group semantics differ).
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            ps: Seq[Double], buckets: Int = 32,
                            maxFoldRows: Long = 1_000_000L): DataFrame = {
    require(ps.nonEmpty, "groupedExactQuantiles: need at least one quantile")
    require(ps.forall(p => p > 0.0 && p <= 1.0),
      s"groupedExactQuantiles: quantiles must be in (0, 1], got $ps")
    val session = df.sparkSession
    import session.implicits._
    val (cum, nByGroup, cached) =
      groupedCum(df, groupCol, valueCol, buckets, maxFoldRows,
        "groupedExactQuantiles")
    if (nByGroup.isEmpty) {
      cached.unpersist()
      return Seq.empty[(String, Double, Long, Long, Double)]
        .toDF(groupCol, "p", "k", "n", "value")
    }
    // per-group rank frame, built on the driver from the same fold:
    // k = ⌈p·n_g⌉ as an IEEE double product — the oracle's expression
    val rankRows = for {
      (g, n) <- nByGroup.toSeq
      p <- ps
    } yield (g, p, math.max(1L, math.ceil(p * n.toDouble).toLong), n)
    val ranks = rankRows.toDF("g", "p", "k", "n")
    val rows = cum.join(broadcast(ranks), Seq("g"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g"), col("p"), col("k"), col("n"))
      .agg(min(col("v")).as("value"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    cached.unpersist()
    rows.sortBy(r => (r._1, r._2)).toSeq
      .toDF(groupCol, "p", "k", "n", "value")
  }

  /** Shared machinery of the per-group quantile family: exact
    * cumulative counts per (group, distinct value) via the bucketed
    * prefix sum — per-(group, distinct value) counts (one partial-agged
    * shuffle), local cumsums per (group, bucket), and a DRIVER fold of
    * the (group, bucket) totals (planning-sized for real grouping keys,
    * guarded by `maxFoldRows` — fail loud, never a silent giant
    * collect). Returns the cumulative frame `(g string, v double,
    * cum long)` plus each group's total observed count from the SAME
    * fold (no second pass). Group keys carry as their STRING rendering
    * (the fold and the literal rank frames need one concrete type);
    * NULL values and NULL group keys are excluded (observed-values
    * policy; cross-engine null-group semantics differ). The counts
    * frame is PERSISTED ([[globalCum]]'s contract — the boundary
    * sample fills the cache, so the fold and the caller's probe pay
    * ONE corpus scan between them) and returned third for the CALLER
    * to unpersist after its probe action.
    */
  private def groupedCum(df: DataFrame, groupCol: String, valueCol: String,
                         buckets: Int, maxFoldRows: Long, caller: String)
      : (DataFrame, Map[String, Long], DataFrame) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = col(valueCol).cast("double")
    val obs = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    val counts = obs.groupBy(col(groupCol).cast("string").as("g"), v.as("v"))
      .agg(count(lit(1)).as("c"))
      .persist(lvl)
    // GLOBAL approx boundaries: accuracy only balances tasks, and one
    // boundary set serves every group (a per-group set would be a
    // groups×quantiles sample pass for zero correctness gain)
    val bounds = approxBounds(counts, "v", buckets)
    val withB =
      if (bounds.isEmpty) counts.withColumn("b", lit(0))
      else counts.withColumn("b", bucketExpr(bounds, col("v")))
    val inBucket = Window.partitionBy(col("g"), col("b")).orderBy(col("v"))
    val local = withB.withColumn("lc", sum(col("c")).over(inBucket))
    // driver fold keyed by group (bucketedCdf's literal-frame pattern,
    // same lineage-binding rationale) — |groups|·buckets rows
    val totals = withB.groupBy(col("g"), col("b")).agg(sum(col("c")).as("tc"))
      .collect()
    require(totals.length <= maxFoldRows,
      s"$caller: ${totals.length} (group, bucket) totals exceed " +
        s"maxFoldRows=$maxFoldRows — the grouping key is too fine for the " +
        "driver fold; raise maxFoldRows deliberately or pre-aggregate the key")
    val byGroup = totals.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val offRows = byGroup.iterator.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, tc) =>
        val row = (g, b, acc); acc += tc; row
      }
    }.toSeq
    val nByGroup = byGroup.map { case (g, rows) => g -> rows.map(_._3).sum }
    val session = df.sparkSession
    import session.implicits._
    val cum =
      if (offRows.isEmpty) local.select(col("g"), col("v"), col("lc").as("cum"))
      else local.join(broadcast(offRows.toDF("g", "b", "off")), Seq("g", "b"))
        .select(col("g"), col("v"), (col("lc") + col("off")).as("cum"))
    (cum, nByGroup.toMap, counts)
  }

  /** Exact INTERPOLATED quantiles with bounded memory — bit-identical
    * to Spark's `percentile` (and therefore to DuckDB `quantile_cont`,
    * the parity x_percentiles pins) WITHOUT its scale cliff: Spark's
    * aggregate buffers every value of the column in ONE aggregation
    * buffer, this form reads TWO order statistics per requested p off
    * the same bucketed prefix-sum CDF as [[exactQuantiles]] and lerps.
    * Replicates the `percentile` arithmetic exactly: 0-based position
    * pos = (n−1)·p (IEEE product), bracketing 1-based ranks
    * k_lo = ⌊pos⌋+1 and k_hi = ⌈pos⌉+1, and the lerp in Spark's own
    * operand order `(higher−pos)·v_lo + (pos−lower)·v_hi` (NOT the
    * algebraically-equal `v_lo + frac·(v_hi−v_lo)`, which can differ
    * in the last ulp). Both ranks probe the CDF in ONE broadcast pass
    * (2·|ps| probe rows, partial-agged MIN) — nothing corpus-sized is
    * sorted, buffered, or collected. Returns a LITERAL frame
    * `(p, n, value)` (|ps| rows, collected at call time — the
    * [[exactQuantiles]] contract: consumers embed the result as a
    * broadcast literal instead of re-deriving the CDF per action, and
    * the persisted counts frame caps the whole call at ONE corpus
    * scan); `ps` in [0, 1]; NULLs excluded (observed-values policy);
    * empty input → empty frame.
    */
  def interpolatedQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                            buckets: Int = 32): DataFrame = {
    require(ps.nonEmpty, "interpolatedQuantiles: need at least one quantile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"interpolatedQuantiles: quantiles must be in [0, 1], got $ps")
    val session = df.sparkSession
    import session.implicits._
    val (cum, n, cached) = globalCum(df, valueCol, buckets)
    if (n == 0L) {
      cached.unpersist()
      return Seq.empty[(Double, Long, Double)].toDF("p", "n", "value")
    }
    // bracketing ranks on the driver, in the aggregate's own
    // arithmetic: pos = (n−1)·p as an IEEE product
    val rankRows = ps.map { p =>
      val pos = (n - 1).toDouble * p
      (p, n, pos, math.floor(pos).toLong + 1L, math.ceil(pos).toLong + 1L)
    }
    val probes = rankRows.toDF("p", "n", "pos", "k_lo", "k_hi")
      .select(col("p"), col("n"), col("pos"), col("k_lo"), col("k_hi"),
        explode(array(col("k_lo"), col("k_hi"))).as("k"))
    // rank probe: broadcast-nested-loop against the cached CDF,
    // partial-agged min — linear in |distinct values|, no sort
    val rows = cum.join(broadcast(probes), col("cum") >= col("k"))
      .groupBy(col("p"), col("n"), col("pos"),
        col("k_lo"), col("k_hi"), col("k"))
      .agg(min(col("v")).as("vv"))
      .groupBy(col("p"), col("n"), col("pos"), col("k_lo"), col("k_hi"))
      .agg(min(when(col("k") === col("k_lo"), col("vv"))).as("v_lo"),
        min(when(col("k") === col("k_hi"), col("vv"))).as("v_hi"))
      .select(col("p"), col("n"), interpLerp.as("value"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    cached.unpersist()
    rows.sortBy(_._1).toSeq.toDF("p", "n", "value")
  }

  /** Spark `percentile`'s exact lerp over the probed bracketing order
    * statistics: `(higher − pos)·v_lo + (pos − lower)·v_hi`, with the
    * integral-position branch returning v_lo directly (matching the
    * aggregate's `higher == lower` branch, which never multiplies). */
  private def interpLerp: org.apache.spark.sql.Column =
    when(col("k_lo") === col("k_hi"), col("v_lo"))
      .otherwise(
        ((col("k_hi") - 1).cast("double") - col("pos")) * col("v_lo") +
          (col("pos") - (col("k_lo") - 1).cast("double")) * col("v_hi"))

  /** Per-group [[interpolatedQuantiles]] — the scale-safe replacement
    * for `percentile(...) GROUP BY g` at its interpolated call sites
    * (winsorize bounds, MAD medians, length-trim percentiles), whose
    * aggregation buffer holds every value of the hottest group. Same
    * machinery as [[groupedExactQuantiles]] (shared [[groupedCum]]):
    * the bracketing ranks come from the driver fold's per-group counts
    * under the SAME IEEE arithmetic as Spark's `percentile`
    * (pos = (n_g−1)·p, lerp in the aggregate's operand order — see
    * [[interpolatedQuantiles]]), and both ranks probe the per-group CDF
    * in one broadcast pass. Returns `(groupCol, p, n, value)` with the
    * group key STRING-rendered (cast back at the call site if a
    * numeric key must round-trip). EAGER-MATERIALIZATION CONTRACT
    * applies (object scaladoc): the driver fold runs at call time.
    */
  def groupedInterpolatedQuantiles(df: DataFrame, groupCol: String,
                                   valueCol: String, ps: Seq[Double],
                                   buckets: Int = 32,
                                   maxFoldRows: Long = 1_000_000L): DataFrame = {
    require(ps.nonEmpty, "groupedInterpolatedQuantiles: need at least one quantile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedInterpolatedQuantiles: quantiles must be in [0, 1], got $ps")
    val session = df.sparkSession
    import session.implicits._
    val (cum, nByGroup, cached) =
      groupedCum(df, groupCol, valueCol, buckets, maxFoldRows,
        "groupedInterpolatedQuantiles")
    if (nByGroup.isEmpty) {
      cached.unpersist()
      return Seq.empty[(String, Double, Long, Double)]
        .toDF(groupCol, "p", "n", "value")
    }
    // bracketing ranks on the driver from the same fold, in the
    // aggregate's own arithmetic: pos = (n−1)·p as an IEEE product
    val rankRows = for {
      (g, n) <- nByGroup.toSeq
      p <- ps
    } yield {
      val pos = (n - 1).toDouble * p
      (g, p, n, pos, math.floor(pos).toLong + 1L, math.ceil(pos).toLong + 1L)
    }
    val probes = rankRows.toDF("g", "p", "n", "pos", "k_lo", "k_hi")
      .select(col("g"), col("p"), col("n"), col("pos"),
        col("k_lo"), col("k_hi"),
        explode(array(col("k_lo"), col("k_hi"))).as("k"))
    val rows = cum.join(broadcast(probes), Seq("g"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g"), col("p"), col("n"), col("pos"),
        col("k_lo"), col("k_hi"), col("k"))
      .agg(min(col("v")).as("vv"))
      .groupBy(col("g"), col("p"), col("n"), col("pos"),
        col("k_lo"), col("k_hi"))
      .agg(min(when(col("k") === col("k_lo"), col("vv"))).as("v_lo"),
        min(when(col("k") === col("k_hi"), col("vv"))).as("v_hi"))
      .select(col("g"), col("p"), col("n"), interpLerp.as("value"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    cached.unpersist()
    rows.sortBy(r => (r._1, r._2)).toSeq
      .toDF(groupCol, "p", "n", "value")
  }

  /** Population Stability Index between the rows where `sampleACond`
    * holds (reference) and the rest (current) — the drift score model
    * monitoring pages on (rule of thumb: <0.1 stable, >0.25 shifted).
    * PSI = Σ_bins (pA − pB)·ln(pA/pB) over `bins` equal-width bins of
    * the pooled [min, max]; Laplace-smoothed bin shares
    * ((c+1)/(n+bins)) keep empty bins finite. One aggregation pass for
    * the bounds, one for the bin counts (both partial-agged); the PSI
    * sum runs over ≤ bins rows. Equal-width (not quantile) bins keep
    * the bin function an exact closed form of (min, max) — replayable
    * bit-for-bit cross-engine, where approx-quantile edges would not
    * be.
    */
  def psi(df: DataFrame, valueCol: String,
          sampleACond: org.apache.spark.sql.Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "psi: need at least two bins")
    val v = col(valueCol).cast("double")
    // observed values only: floor(null)=null and least(null, bins-1)
    // skips nulls, so an unfiltered NULL would silently land in the top
    // bin and count as an extreme-high value
    val pts = df.filter(col(valueCol).isNotNull).select(v.as("v"),
      when(sampleACond, 1L).otherwise(0L).as("ia"))
    val bounds = broadcast(pts.agg(min(col("v")).as("mn"), max(col("v")).as("mx")))
    val binned = pts.crossJoin(bounds)
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0)) // degenerate range: one bin
          .otherwise(least(
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / bins)),
            lit(bins - 1))).cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
    // the binned table is ≤ bins rows: collect it once and finish the
    // statistic on the driver (planning-sized, like the prefix-sum
    // offsets) — re-deriving totals as a second Spark aggregation
    // would recompute the whole binning subtree (4 scans instead of 2)
    val rows = binned.collect()
    val nA = rows.map(_.getLong(1)).sum
    val nB = rows.map(_.getLong(2)).sum
    // fixed bin order so the float sum is reproducible
    val psiVal = rows.sortBy(_.getInt(0)).map { r =>
      val pa = (r.getLong(1) + 1).toDouble / (nA + bins)
      val pb = (r.getLong(2) + 1).toDouble / (nB + bins)
      (pa - pb) * math.log(pa / pb)
    }.sum
    val session = df.sparkSession
    import session.implicits._
    Seq((nA, nB, psiVal)).toDF("n_a", "n_b", "psi")
  }

  /** Exact Gini coefficient WITHOUT a global sort — the single-number
    * inequality companion of [[pareto]] (corpus length inequality,
    * revenue concentration, per-source dominance). Standard rank form
    * G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over ascending-sorted values —
    * but the rank sum is read off the SAME bucketed prefix-sum CDF as
    * [[exactQuantiles]]: a distinct value v with count c and exclusive
    * prefix p occupies ranks p+1..p+c, so Σ i·x over its tie block is
    * v·c·(2p+c+1)/2 regardless of within-tie order (ties make
    * ROW_NUMBER replays order-independent). Everything integer runs in
    * decimal(38,0) (ANSI: overflow fails LOUD, never wraps); the only
    * float ops are the two final divisions and one subtraction, in a
    * pinned order both engines replay bit-for-bit. One row out:
    * `(n, total, gini)`, gini rounded to 6.
    *
    * Scale shape: one partial-agged per-distinct-value count shuffle
    * (persisted — [[globalCum]]), per-bucket local cumsums, ≤ buckets
    * driver-folded offsets, then ONE |distinct|-sized equi-join +
    * decimal agg. Nothing corpus-sized is sorted, windowed globally,
    * or collected. Values must be non-negative INTEGERS with a
    * positive total (the Lorenz-curve domain the decimal(38,0) rank
    * algebra assumes) — non-negativity, integrality, AND the positive
    * total are all checked in the SAME aggregation pass and fail LOUD:
    * a fractional column (a price, a ratio) would otherwise be
    * silently rounded to decimal(38,0) per value and produce a
    * plausible-but-wrong Gini. For fractional data, rescale to an
    * integer grid first (e.g. `round(col * 100)` for cents) — the
    * Gini of a uniformly rescaled column is identical.
    */
  def gini(df: DataFrame, valueCol: String, buckets: Int = 32): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val (cum, n, cached) = globalCum(df, valueCol, buckets)
    if (n == 0L) {
      cached.unpersist()
      return Seq.empty[(Long, Long, Double)].toDF("n", "total", "gini")
    }
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // cached = (v, c) per distinct value; cum = (v, cum) off the same
    // persisted frame — the join is |distinct|⋈|distinct| on the key
    val row = cum.join(cached, Seq("v"))
      .agg(
        min(col("v")).as("mn"),
        sum(dec(col("v")) * dec(col("c"))).as("t"),
        // Σ v·c·(2p + c + 1) = 2·Σ i·x — kept doubled so the decimal
        // path never divides (decimal division reshapes scale)
        sum(dec(col("v")) * dec(col("c")) *
          (dec(col("cum") - col("c")) * 2 + dec(col("c")) + 1)).as("s2"),
        // integrality sentinel, same pass: the decimal(38,0) casts
        // above ROUND each value — fine on the integer Lorenz domain,
        // a silent wrong answer on fractional data
        sum(when(col("v") =!= floor(col("v")), 1L).otherwise(0L)).as("n_frac"))
      .collect()(0)
    cached.unpersist()
    require(row.getLong(3) == 0L,
      s"gini: ${row.getLong(3)} fractional values in '$valueCol' — the " +
        "decimal(38,0) rank algebra is exact only on integers; rescale to an " +
        "integer grid first (e.g. round(col * 100) for cents — Gini is " +
        "invariant under uniform rescaling)")
    require(row.getDouble(0) >= 0.0,
      s"gini: negative values break the Lorenz domain (min=${row.getDouble(0)})")
    val t = BigInt(row.getDecimal(1).toBigInteger)
    val s2 = BigInt(row.getDecimal(2).toBigInteger)
    require(t > 0, "gini: total must be positive")
    require(t.isValidLong,
      s"gini: total $t exceeds the BIGINT output contract — rescale the value column")
    val nd = n.toDouble
    val g = s2.toDouble / (nd * t.toDouble) - (nd + 1.0) / nd
    Seq((n, t.toLong, BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble)).toDF("n", "total", "gini")
  }

  /** Pareto concentration curve — "the top X% of keys hold Y% of the
    * value" (revenue concentration, corpus-source dominance, hot-key
    * share). Keys are ranked by DESCENDING per-key value and cut into
    * `bins` equal-count bins (NTILE semantics); each bin reports its
    * key count and the CUMULATIVE value share through that bin.
    *
    * Scale shape: the per-key totals come from one partial-agged hash
    * agg (DECIMAL sums — exact in any order); the global descending
    * cumulative sum then runs on the same bucketed prefix-sum pattern
    * as [[ksTest]] — approx boundaries split the value line, buckets
    * cumsum locally, per-bucket totals cascade through a tiny window
    * and broadcast back. No single-task window over the key table at
    * any size. Bucket assignment casts the decimal to double ONLY for
    * boundary comparison (monotone, and ties stay inside one bucket),
    * so the sums themselves remain exact.
    */
  def paretoCurve(df: DataFrame, keyCol: String, valueCol: String,
                  bins: Int = 10, buckets: Int = 32): DataFrame = {
    require(bins >= 1, "paretoCurve: bins must be >= 1")
    val perKey = df.groupBy(col(keyCol).as("k"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("rev"))
      // descending rank = ascending rank of the NEGATED value (exact
      // for decimals); key breaks ties deterministically
      .withColumn("ord", expr("-rev"))
    val ordD = col("ord").cast("double")
    val bounds = approxBounds(perKey.select(ordD.as("od")), "od", buckets)
    val withB =
      if (bounds.isEmpty) perKey.withColumn("b", lit(0))
      else perKey.withColumn("b", bucketExpr(bounds, ordD))
    val inB = Window.partitionBy(col("b")).orderBy(col("ord"), col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("ord"), col("k"))).cast("long"))
      .withColumn("lrev", sum(col("rev")).over(inB))
    // driver-folded offsets over ≤ buckets rows — see bucketedCdf's
    // note on the lineage-sharing binding trap; decimal sums stay
    // exact through java.math.BigDecimal
    val totals = withB.groupBy(col("b"))
      .agg(count(lit(1)).as("tc"), sum(col("rev")).as("trev"))
      .collect().sortBy(_.getInt(0))
    var accN = 0L
    var accRev = java.math.BigDecimal.ZERO
    val offRows = totals.map { r =>
      val row = (r.getInt(0), accN, accRev)
      accN += r.getLong(1)
      accRev = accRev.add(r.getDecimal(2))
      row
    }.toSeq
    val session = df.sparkSession
    import session.implicits._
    val offsets = offRows.toDF("b", "offN", "offRev")
      .select(col("b"), col("offN"), col("offRev").cast("decimal(38,2)").as("offRev"))
    val tot = broadcast(perKey.agg(count(lit(1)).as("n"),
      sum(col("rev")).as("totRev")))
    local.join(broadcast(offsets), Seq("b")).crossJoin(tot)
      .withColumn("rn", col("offN") + col("lr"))
      .withColumn("cumRev", col("offRev") + col("lrev"))
      // NTILE bin of rank rn over n keys in `bins` bins
      .withColumn("base", expr(s"n div $bins"))
      .withColumn("rem", expr(s"n % $bins"))
      .withColumn("cut", col("rem") * (col("base") + 1))
      .withColumn("bin",
        (when(col("rn") <= col("cut"), expr("(rn - 1) div (base + 1)"))
          .otherwise(col("rem") + expr("(rn - cut - 1) div base")) + 1).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_keys"),
        max(struct(col("rn"), col("cumRev"))).getField("cumRev").as("binCum"),
        first(col("totRev")).as("totRev"))
      .select(col("bin"), col("n_keys"),
        (col("binCum").cast("double") / col("totRev").cast("double"))
          .as("cum_share"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) between the rows where
    * `sampleACond` holds and the rest — the nonparametric "did the
    * distribution shift" test that pairs with [[ksTest]] (KS sees
    * shape, U sees location). Midranks handle ties exactly: a tie
    * group's rank is the average of the positions it spans, derived
    * from the same bucketed CDF — cumulative count at the value gives
    * the group's END position, the group size its extent, so
    * midrank = end - (size-1)/2 with no global window anywhere.
    * Output: n_a, n_b, u_a (U statistic of sample A), r_a (A's
    * rank-sum), and the normal-approximation z with tie correction.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String,
                   sampleACond: org.apache.spark.sql.Column,
                   buckets: Int = 32): DataFrame = {
    val cdf = bucketedCdf(df, valueCol, sampleACond, buckets)
    // a tie group's SIZE comes from a second per-value aggregation
    // (same shuffle key as the CDF's), not from a lag over a global
    // window — the operator stays free of single-task scans
    val counts = df
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(sum(when(sampleACond, 1L).otherwise(0L)).as("gna"),
        sum(when(sampleACond, 0L).otherwise(1L)).as("gnb"))
    val ranks = cdf.join(counts, Seq("v"))
      .withColumn("sz", col("gna") + col("gnb"))
      .withColumn("midrank",
        (col("ca") + col("cb")).cast("double") - (col("sz") - 1).cast("double") / 2.0)
    val totals = broadcast(ranks.agg(
      max(col("ca")).as("n_a"), max(col("cb")).as("n_b"),
      // tie correction term Σ (t³ - t) over tie groups
      sum(col("sz") * col("sz") * col("sz") - col("sz")).as("tie3")))
    val n = col("n_a") + col("n_b")
    val mu = col("n_a").cast("double") * col("n_b").cast("double") / 2.0
    val tieAdj = lit(1.0) - col("tie3").cast("double") /
      (n.cast("double") * (n - 1).cast("double") * (n + 1).cast("double"))
    val sigma = sqrt(col("n_a").cast("double") * col("n_b").cast("double")
      * (n + 1).cast("double") / 12.0 * tieAdj)
    ranks.crossJoin(totals)
      .groupBy(col("n_a"), col("n_b"), col("tie3"))
      .agg(sum(col("midrank") * col("gna")).as("r_a"))
      .withColumn("u_a",
        col("r_a") - col("n_a").cast("double") * (col("n_a") + 1).cast("double") / 2.0)
      .withColumn("z", (col("u_a") - mu) / sigma)
      .select(col("n_a"), col("n_b"), col("r_a"), col("u_a"), col("z"))
  }

  /** Per-group winsorized and trimmed means — the outlier-robust
    * aggregates a metrics/feature pipeline uses where a plain mean is
    * hostage to a single fat-finger value: winsorizing CLIPS values to
    * the group's exact [lo, hi] percentiles, trimming DROPS values
    * outside them.
    *
    * The exact interpolated percentile bounds come from
    * [[groupedInterpolatedQuantiles]] (bit-identical to Spark's
    * `percentile` == DuckDB `quantile_cont`, parity pinned by
    * x_percentiles) — bounded memory at any group size, where the
    * `percentile` aggregate buffers the hottest group's every value in
    * ONE buffer (the round-8 verdict's last 100 TB cliff). Pass 2
    * re-scans with the |groups|-row bound table broadcast back and
    * aggregates the clipped/filtered values. Sums run in
    * DECIMAL(28,6) so they are exact in any aggregation order — the
    * single final double division is the only float op. NULL values
    * are excluded (observed-values policy, object scaladoc). The
    * bounds join compares the group key by its STRING rendering (the
    * [[groupedCum]] contract); eager-materialization contract applies.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
                      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"winsorizedStats: bad bounds [$lo, $hi]")
    val v = col(valCol).cast("double")
    val obs = df.filter(col(valCol).isNotNull)
    // bounds rounded to 6 dp BEFORE clipping: the decimal cast of a
    // clipped-to-bound value is then exact on both engines (no
    // double->decimal midpoint rule in play for the bound values)
    val bounds = groupedInterpolatedQuantiles(obs, groupCol, valCol, Seq(lo, hi))
      .groupBy(col(groupCol).as("g"))
      .agg(round(min(when(col("p") === lo, col("value"))), 6).as("p_lo"),
        round(min(when(col("p") === hi, col("value"))), 6).as("p_hi"))
    val clipped = least(greatest(v, col("p_lo")), col("p_hi"))
    obs.join(broadcast(bounds), col(groupCol).cast("string") === col("g")).drop("g")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("p_lo")).as("p_lo"),
        first(col("p_hi")).as("p_hi"),
        (sum(clipped.cast("decimal(28,6)")).cast("double") / count(lit(1)))
          .as("winsor_mean"),
        (sum(when(v >= col("p_lo") && v <= col("p_hi"),
          v.cast("decimal(28,6)"))).cast("double") /
          sum(when(v >= col("p_lo") && v <= col("p_hi"), 1L).otherwise(0L)))
          .as("trimmed_mean"))
  }

  /** Per-row NTILE(bins) + LEAD(value) over a GLOBAL (value, tie)
    * order WITHOUT a single-partition window — the scale-safe form of
    * the classic `NTILE(n) OVER (ORDER BY v)` / `LEAD(v) OVER (ORDER
    * BY v)` pair, which moves the ENTIRE table through one task (the
    * textbook driver-side-equivalent bottleneck the rest of this
    * object exists to avoid).
    *
    * Machinery ([[equiDepthBins]]'s, plus a boundary-row exchange for
    * the lead): the bucket id is a monotone function of `valueCol`
    * alone (so a tie block never straddles buckets and the in-bucket
    * order can use the ORIGINAL column), each bucket ranks and leads
    * locally under a PARTITIONED window, and ONE planning-sized
    * driver fold over the ≤ `buckets` per-bucket summaries yields (a)
    * exact rank offsets, (b) the global row count the NTILE cut
    * needs, and (c) each bucket's FIRST row's value — broadcast back
    * so a bucket's LAST row takes its successor bucket's first value
    * as the lead (the boundary-row exchange; the global last row
    * keeps NULL, as LEAD defines). NTILE is the exact SQL row-count
    * form (first n mod bins bins take one extra row, integral div
    * throughout).
    *
    * Ordering is (`valueCol` ASC or DESC per `descending`, `tieCol`
    * ASC); (value, tie) must be unique (the usual NTILE determinism
    * requirement) and NULL values are excluded up front
    * (observed-values policy — pre-filter or coalesce if NULLs must
    * rank). Returns every input column plus `ntile` (int) and
    * `next_value` (valueCol's type). Eager-materialization contract
    * (object scaladoc) applies: the fold runs at call time.
    */
  def ntileLead(df: DataFrame, valueCol: String, tieCol: String,
                bins: Int, descending: Boolean = false,
                buckets: Int = 32): DataFrame = {
    require(bins >= 1, "ntileLead: bins must be >= 1")
    val session = df.sparkSession
    import session.implicits._
    val obs = df.filter(col(valueCol).isNotNull)
    // monotone double rendering of the ORDER position: negation flips
    // the bucket order for DESC; equal doubles from distinct values
    // only merge buckets (in-bucket order uses the original column)
    val ord = if (descending) -col(valueCol).cast("double")
      else col(valueCol).cast("double")
    val bounds = approxBounds(obs.select(ord.as("__ord")), "__ord", buckets)
    val withB = obs.withColumn("__ord", ord)
      .withColumn("__b",
        if (bounds.isEmpty) lit(0) else bucketExpr(bounds, col("__ord")))
    val inB = Window.partitionBy(col("__b"))
      .orderBy(col("__ord"), col(tieCol))
    val local = withB
      .withColumn("__lr", row_number().over(inB).cast("long"))
      .withColumn("__lead", lead(col(valueCol), 1).over(inB))
    // ONE planning-sized action: per-bucket row count + first row's
    // value (min struct over the unique (ord, tie) order carries the
    // value as payload) — ≤ buckets rows
    val sums = withB.groupBy(col("__b"))
      .agg(count(lit(1)).as("__tc"),
        min(struct(col("__ord"), col(tieCol), col(valueCol)))
          .getField(valueCol).as("__first"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.get(2)))
      .sortBy(_._1)
    val n = sums.map(_._2).sum
    if (n == 0L) {
      // empty in, empty out — with the output schema intact
      return local.filter(lit(false))
        .withColumn("ntile", lit(1).cast("int"))
        .withColumn("next_value", col("__lead"))
        .drop("__ord", "__b", "__lr", "__lead")
    }
    var acc = 0L
    val vType = df.schema(df.schema.fieldIndex(valueCol)).dataType
    val meta = sums.zipWithIndex.map { case ((b, tc, _), i) =>
      val nextFirst = if (i + 1 < sums.length) sums(i + 1)._3 else null
      val row = (b, acc, tc, nextFirst)
      acc += tc
      row
    }.toSeq
    val metaDf = meta.map { case (b, off, tc, nf) => (b, off, tc) }
      .toDF("__b", "__off", "__btc")
    // the boundary values ride as a typed literal column (per-bucket
    // CASE over ≤ buckets branches), cast back to the input type so
    // the when/otherwise below unifies without widening the schema
    val nextFirstCol = meta
      .foldLeft(lit(null).cast(vType)) { case (acc0, (b, _, _, nf)) =>
        when(col("__b") === b, lit(nf).cast(vType)).otherwise(acc0)
      }
    val out = local.join(broadcast(metaDf), Seq("__b"))
      .withColumn("__rn", col("__off") + col("__lr"))
      // NTILE row-count form over the driver-folded n (equiDepthBins)
      .withColumn("__base", lit(n / bins))
      .withColumn("__rem", lit(n % bins))
      .withColumn("__cut", col("__rem") * (col("__base") + 1))
      .withColumn("ntile",
        (when(col("__rn") <= col("__cut"),
          expr("(__rn - 1) div (__base + 1)"))
          .otherwise(col("__rem") + expr("(__rn - __cut - 1) div __base"))
          + 1).cast("int"))
      .withColumn("next_value",
        when(col("__lr") < col("__btc"), col("__lead"))
          .otherwise(nextFirstCol))
    out.drop("__ord", "__b", "__lr", "__lead", "__off", "__btc",
      "__rn", "__base", "__rem", "__cut")
  }

  /** Equi-depth binning (NTILE semantics, but no single-task global
    * window): every row's global rank ordered by (`valueCol`,
    * `tieCol`) comes from the same bucketed prefix sum as [[ksTest]],
    * and bin k of `bins` gets the NTILE row counts (the first
    * n mod bins bins take one extra row). Returns per-bin count, min
    * and max of `valueCol`. `tieCol` must make (value, tie) unique.
    */
  def equiDepthBins(df: DataFrame, valueCol: String, tieCol: String,
                    bins: Int, buckets: Int = 32): DataFrame = {
    require(bins >= 1, "equiDepthBins: bins must be >= 1")
    // global rank without a global window, in ONE bucketed pass:
    // bucket id is a function of v alone (so a tie group never
    // straddles buckets), per-bucket row_number over (v, tie) after
    // one shuffle on the bucket id, then strictly-earlier-bucket row
    // totals (≤ buckets rows, tiny window) broadcast back as offsets
    val keyed = df.select(col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    val bounds = approxBounds(keyed, "v", buckets)
    val withB =
      if (bounds.isEmpty) keyed.withColumn("b", lit(0))
      else keyed.withColumn("b", bucketExpr(bounds, col("v")))
    val inB = Window.partitionBy(col("b")).orderBy(col("v"), col("t"))
    val local = withB.withColumn("lr", row_number().over(inB).cast("long"))
    // driver-folded offsets over ≤ buckets rows — see bucketedCdf's
    // note on the lineage-sharing binding trap
    val totals = withB.groupBy(col("b")).agg(count(lit(1)).as("tc"))
      .collect().sortBy(_.getInt(0))
    var acc = 0L
    val offRows = totals.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toSeq
    val session = df.sparkSession
    import session.implicits._
    val offsets = offRows.toDF("b", "off")
    val withRank = local.join(broadcast(offsets), Seq("b"))
      .withColumn("rn", col("off") + col("lr"))
    val n = broadcast(withRank.agg(count(lit(1)).as("n")))
    // NTILE semantics: first (n mod bins) bins take base+1 rows.
    // Integral div throughout — `/` on longs is double division in
    // Spark SQL and mangles ranks past 2^53.
    withRank.crossJoin(n)
      .withColumn("base", expr(s"n div $bins"))
      .withColumn("rem", expr(s"n % $bins"))
      .withColumn("cut", col("rem") * (col("base") + 1))
      .withColumn("bin",
        when(col("rn") <= col("cut"), expr("(rn - 1) div (base + 1)"))
          .otherwise(col("rem") + expr("(rn - cut - 1) div base")))
      .groupBy((col("bin") + 1).cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }
}
