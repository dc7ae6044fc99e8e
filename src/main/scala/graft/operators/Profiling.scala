package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, StringType}

/** One-pass column-profile report — the "data quality summary" every
  * ingest pipeline runs before trusting a new drop: per column, row
  * count, null count, exact distinct count, numeric min/max, string
  * min/max and mean length.
  *
  * The reference pipeline has no profiling surface; this supports the
  * training-data extension set (a 100 TB corpus drop is profiled before
  * any dedup/mixing decision is made on it).
  *
  * Shape: ONE aggregation pass over the input produces a single wide
  * row (all per-column aggregates partial-aggregate map-side), then a
  * `stack` generator pivots it to one row per column — the pivot runs
  * on one row, so the report costs exactly one scan + one 1-row
  * shuffle regardless of column count.
  *
  * The one scale caveat is exact COUNT(DISTINCT): Spark plans k
  * distinct aggregates as a k-way Expand of the scan (each row
  * replicated once per profiled column) before the partial aggregate.
  * That is the price of exactness; [[profileApprox]] swaps in
  * HyperLogLog++ (`approx_count_distinct`) which keeps the plan
  * Expand-free — the right default at 100 TB, spec-checked against the
  * exact path. The exact form is the oracle-checked one
  * (`x_profile`).
  */
object Profiling {

  /** Exact profile. `columns` empty = all columns. */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    build(df, columns, exact = true)

  /** HLL++ distinct counts (relative error `rsd`), no Expand in the
    * plan — the 100 TB form. Otherwise identical to [[profile]]. */
  def profileApprox(df: DataFrame, columns: Seq[String] = Nil,
                    rsd: Double = 0.05): DataFrame =
    build(df, columns, exact = false, rsd)

  private def isNum(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  private def build(df: DataFrame, columns: Seq[String], exact: Boolean,
                    rsd: Double = 0.05): DataFrame = {
    val fields = {
      val all = df.schema.fields.toSeq
      if (columns.isEmpty) all else all.filter(f => columns.contains(f.name))
    }
    require(fields.nonEmpty, "profile: no columns selected")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val nd =
        if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
      Seq(count(c).as(s"__nn_${f.name}"), nd.as(s"__nd_${f.name}")) ++
        (if (isNum(f.dataType))
          Seq(min(c).cast("double").as(s"__mn_${f.name}"),
            max(c).cast("double").as(s"__mx_${f.name}"))
        else
          // non-numeric (string/date/bool): min/max in the native
          // order, rendered as strings; mean length only for strings
          Seq(min(c).cast("string").as(s"__ms_${f.name}"),
            max(c).cast("string").as(s"__xs_${f.name}")) ++
            (if (f.dataType == StringType)
              Seq(round(avg(length(c)), 4).as(s"__al_${f.name}"))
            else Nil))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = fields.map { f =>
      val n = f.name
      if (isNum(f.dataType))
        s"'$n', __n - __nn_$n, __nd_$n, __mn_$n, __mx_$n, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS DOUBLE)"
      else {
        val al = if (f.dataType == StringType) s"__al_$n" else "CAST(NULL AS DOUBLE)"
        s"'$n', __n - __nn_$n, __nd_$n, CAST(NULL AS DOUBLE), " +
          s"CAST(NULL AS DOUBLE), __ms_$n, __xs_$n, $al"
      }
    }.mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${fields.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_num, max_num, min_str, max_str, avg_len)")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"), col("avg_len"))
  }
}
