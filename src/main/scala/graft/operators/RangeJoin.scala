package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-range join — the "match each point to the
  * intervals containing it" shape (price bands, IP blocks, time
  * slots, histogram bins with overlap). The naive formulation is a
  * theta join, which Spark can only run as a broadcast nested loop /
  * cartesian — O(|points| × |ranges|) comparisons, a scale killer the
  * moment the ranges side stops being tiny.
  *
  * The scale path buckets the number line into fixed-width chunks:
  * each range replicates to every chunk it overlaps (replication
  * factor ≈ span/width + 1), each point lands in exactly ONE chunk,
  * and the join becomes a plain EQUI join on the chunk id with the
  * interval predicate as a cheap post-filter. Because a point has one
  * bucket, no dedup pass is needed — every (point, range) pair is
  * produced exactly once. Both sides shuffle by chunk id, so skew/AQE
  * machinery applies as with any hash join.
  *
  * Pick `bucketWidth` near the typical range span: too small inflates
  * the ranges side (span/width copies per range), too large degrades
  * the post-filter selectivity (many non-matching pairs per chunk).
  */
object RangeJoin {

  /** Per-row tile-replication guard: the tile list for [lo, hi] at
    * `width` is `explode(sequence(chunk(lo), chunk(hi)))`, which with
    * no cap builds a span/width-element array IN ONE ROW — a single
    * extreme-span interval (or a mis-picked tiny width) kills an
    * executor with an opaque OOM long before Spark's own ~2³¹ array
    * limit errors. The guard runs inside the same codegen'd projection
    * (a `when` around the `sequence`, zero extra jobs) and fails LOUD
    * with the span-vs-width diagnosis instead. The over-cap test is the
    * WHEN branch (not the otherwise) so a NULL bound falls through to a
    * NULL `sequence` and the row simply drops — consistent with join
    * semantics (a NULL-bounded interval can never match), and matching
    * the unguarded `explode(sequence(null, …))` behavior; the inverted
    * form would `raise_error` a NULL message on such rows. */
  private def guardedTiles(lo: Column, hi: Column, width: Double,
                           maxTiles: Long, op: String): Column = {
    def chunk(c: Column): Column = floor(c / width).cast("long")
    val n = chunk(hi) - chunk(lo) + lit(1L)
    explode(when(n > maxTiles, raise_error(concat(
        lit(s"$op: interval ["), lo.cast("string"), lit(", "),
        hi.cast("string"), lit(s") spans "), n.cast("string"),
        lit(s" tiles at tileWidth=$width, over maxTilesPerRow=$maxTiles" +
          " — pick a tileWidth near the typical interval span, or raise" +
          " maxTilesPerRow if the replication is intended"))))
      .otherwise(sequence(chunk(lo), chunk(hi))))
  }

  /** Interval × interval OVERLAP join — "which left intervals
    * intersect which right intervals" (sessions × campaign windows,
    * downtime × job runs, span annotations × span annotations). The
    * naive `a.lo < b.hi AND b.lo < a.hi` theta form runs as a
    * broadcast nested loop / cartesian; [[pointInRange]]'s exactly-
    * once trick doesn't apply directly because BOTH sides replicate
    * across tiles.
    *
    * Scale path: both sides tile the number line in fixed-width
    * chunks (an interval replicates to every tile it touches), the
    * join is a plain EQUI join on the tile id, and each overlapping
    * pair survives in EXACTLY ONE tile — the tile containing the
    * overlap's start `max(a.lo, b.lo)`, which lies inside both
    * intervals' tile spans — so no distinct/dedup shuffle ever runs
    * over the (potentially huge) pair output. Intervals are half-open
    * [lo, hi); a pair overlaps iff `a.lo < b.hi && b.lo < a.hi`.
    * Column sets must be disjoint. Pick `tileWidth` near the typical
    * interval span (same trade-off as [[pointInRange]]).
    * `maxTilesPerRow` bounds per-interval replication and fails loud
    * (see [[guardedTiles]]) when one interval would explode to more
    * tiles than that.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      tileWidth: Double,
                      maxTilesPerRow: Long = 100_000L): DataFrame = {
    require(tileWidth > 0, "intervalOverlap: tileWidth must be positive")
    require(maxTilesPerRow >= 1,
      "intervalOverlap: maxTilesPerRow must be >= 1")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalOverlap: overlapping column names ${overlap.mkString(", ")}")
    def chunk(c: Column): Column = floor(c / tileWidth).cast("long")
    val l = left.withColumn("__tile",
      guardedTiles(col(lLo), col(lHi), tileWidth, maxTilesPerRow,
        "intervalOverlap"))
    val r = right.withColumn("__tile",
      guardedTiles(col(rLo), col(rHi), tileWidth, maxTilesPerRow,
        "intervalOverlap"))
    l.join(r, Seq("__tile"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__tile") === chunk(greatest(col(lLo), col(rLo))))
      .drop("__tile")
  }

  /** Join `points` (value column `pCol`) to `ranges` ([`loCol`,
    * `hiCol`) half-open) on containment: lo <= v < hi. Column sets
    * must be disjoint. Output: all columns of both sides, one row per
    * containing range. */
  def pointInRange(points: DataFrame, pCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Double,
                   maxTilesPerRow: Long = 100_000L): DataFrame = {
    require(bucketWidth > 0, "pointInRange: bucketWidth must be positive")
    require(maxTilesPerRow >= 1,
      "pointInRange: maxTilesPerRow must be >= 1")
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty,
      s"pointInRange: overlapping column names ${overlap.mkString(", ")}")
    def chunk(c: Column): Column = floor(c / bucketWidth).cast("long")
    val r = ranges.withColumn("__chunk",
      guardedTiles(col(loCol), col(hiCol), bucketWidth, maxTilesPerRow,
        "pointInRange"))
    val p = points.withColumn("__chunk", chunk(col(pCol)))
    p.join(r, Seq("__chunk"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__chunk")
  }
}
