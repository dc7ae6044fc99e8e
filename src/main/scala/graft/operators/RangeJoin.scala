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

  /** Join `points` (value column `pCol`) to `ranges` ([`loCol`,
    * `hiCol`) half-open) on containment: lo <= v < hi. Column sets
    * must be disjoint. Output: all columns of both sides, one row per
    * containing range. */
  def pointInRange(points: DataFrame, pCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "pointInRange: bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty,
      s"pointInRange: overlapping column names ${overlap.mkString(", ")}")
    def chunk(c: Column): Column = floor(c / bucketWidth).cast("long")
    val r = ranges.withColumn("__chunk",
      explode(sequence(chunk(col(loCol)), chunk(col(hiCol)))))
    val p = points.withColumn("__chunk", chunk(col(pCol)))
    p.join(r, Seq("__chunk"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__chunk")
  }
}
