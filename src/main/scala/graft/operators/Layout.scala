package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — the `OPTIMIZE ZORDER BY`
  * shape (Delta/Iceberg table maintenance): rows are ordered along a
  * space-filling Z-curve over several columns so that a file/rowgroup
  * covers a small HYPER-RECTANGLE of the key space instead of a thin
  * slice of one column. Zone-map (min/max) pruning then works for
  * predicates on ANY of the clustered columns — the single-column
  * sort layout prunes only its leading column.
  *
  * Z-value construction: each column is equi-width quantized to
  * 2^bits cells over its OWN global [min, max] (a one-row broadcast
  * aggregate — no driver action), and the per-column cell indices are
  * bit-interleaved LSB-first (column i contributes bit k to z-bit
  * k·n + i — for two dims the exact bit layout of the native
  * [[graft.functions.ZOrder2]] kernel, which callers with
  * pre-bucketed long ordinals should use directly). Everything is
  * closed-form integer/IEEE arithmetic over (min, max), so a z-value
  * is engine-replayable bit-for-bit — unlike rank-based (equi-depth)
  * quantization, whose boundaries would need an approximate sketch.
  *
  * Scale notes (100 TB): [[zValue]] is a narrow per-row expression
  * (codegen'd bitwise ops — no shuffle, no UDF); the min/max pass is
  * one partial-agged aggregate. [[zorderBy]] adds the ONE range
  * shuffle any re-layout pays (`repartitionByRange` on the z-value +
  * in-partition sort, the exact plan of a writer's `ORDER BY` before
  * `write`); AQE coalesces the range partitions to target size.
  * [[zoneMap]] is the audit: per z-prefix "file", the min/max span of
  * every clustered column — the numbers a scan planner would prune
  * with. On the Z-layout every file's span in EVERY dimension shrinks
  * like 2^(-bits/n); a single-column sort shows span ≈ full range in
  * all non-leading dimensions.
  */
object Layout {

  /** Equi-width cell index of `v` over [mn, mx] in 2^bits cells:
    * `least(floor((v-mn)/(mx-mn) · 2^bits), 2^bits−1)`, degenerate
    * ranges collapsing to cell 0. All-IEEE closed form of the two
    * bound scalars — replayable cross-engine. NULL values quantize to
    * cell 0 (they carry no position; keeping them clustered together
    * at the low edge beats a nullable z). */
  private def cell(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val q = floor((v.cast("double") - mn) / (mx - mn) * math.pow(2, bits).toInt)
      .cast("int")
    when(v.isNull || mn === mx, 0)
      .otherwise(least(q, lit((1 << bits) - 1)))
  }

  /** Bit-interleaved z-value over quantized cells `qs` (LSB-first:
    * column i's bit k lands at z-bit k·n + i). Plain codegen'd
    * shiftright/and/shiftleft — n·bits tiny integer terms. */
  private def interleave(qs: Seq[Column], bits: Int): Column = {
    val n = qs.size
    val terms = for {
      (q, i) <- qs.zipWithIndex
      k <- 0 until bits
    } yield shiftleft(shiftright(q, k).bitwiseAND(lit(1)), k * n + i)
    terms.reduce(_ + _)
  }

  /** The z-value column for `dims` over their global ranges, as a
    * frame transformation: returns `df` plus an integer `zCol` in
    * [0, 2^(bits·|dims|)). The per-column [min, max] bounds ride as a
    * ONE-ROW broadcast aggregate (no driver-side action — the
    * psi/bounds pattern), so the whole operator is one partial-agged
    * stats pass plus a narrow projection. */
  def withZValue(df: DataFrame, dims: Seq[String], bits: Int,
                 zCol: String = "z"): DataFrame = {
    require(dims.nonEmpty, "withZValue: need at least one dimension")
    require(bits >= 1 && bits * dims.size <= 30,
      s"withZValue: bits·dims = ${bits * dims.size} exceeds the int z range")
    val aggs = dims.flatMap { d =>
      Seq(min(col(d).cast("double")).as(s"__mn_$d"),
        max(col(d).cast("double")).as(s"__mx_$d"))
    }
    val bounds = broadcast(df.agg(aggs.head, aggs.tail: _*))
    val cells = dims.map(d =>
      cell(col(d), col(s"__mn_$d"), col(s"__mx_$d"), bits))
    df.crossJoin(bounds)
      .withColumn(zCol, interleave(cells, bits))
      .drop(dims.flatMap(d => Seq(s"__mn_$d", s"__mx_$d")): _*)
  }

  /** Re-layout `df` along the Z-curve over `dims`: range-partition on
    * the z-value into `numPartitions` output "files" and sort within
    * each — the writer-side plan of `OPTIMIZE ZORDER BY`. The z
    * column is dropped on the way out (it is layout metadata, not
    * data); downstream `write.parquet` inherits the clustered order
    * and its zone maps. ONE range shuffle, as any re-layout must pay. */
  def zorderBy(df: DataFrame, dims: Seq[String], bits: Int = 8,
               numPartitions: Int = 0): DataFrame = {
    val z = withZValue(df, dims, bits, "__z")
    val parted =
      if (numPartitions > 0) z.repartitionByRange(numPartitions, col("__z"))
      else z.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** The zone-map audit of a Z-layout: rows are assigned to
    * deterministic "files" by their z-value's high `filesLog2` bits
    * (2^filesLog2 equal z-range files — the deterministic stand-in
    * for range-partition boundaries, which sampling would make
    * run-dependent), and each file reports its row count and the
    * min/max of every clustered column. These spans ARE the parquet
    * footer stats a scan planner prunes with: a predicate on any
    * dimension eliminates every file whose span misses it. One hash
    * aggregation over the z-projected frame. */
  def zoneMap(df: DataFrame, dims: Seq[String], bits: Int,
              filesLog2: Int): DataFrame = {
    require(filesLog2 >= 0 && filesLog2 <= bits * dims.size,
      s"zoneMap: filesLog2 $filesLog2 outside [0, ${bits * dims.size}]")
    val z = withZValue(df, dims, bits, "__z")
    val spans = dims.flatMap { d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))
    }
    z.groupBy(shiftright(col("__z"), bits * dims.size - filesLog2)
        .as("file_id"))
      .agg(count(lit(1)).as("cnt"), spans: _*)
  }
}
