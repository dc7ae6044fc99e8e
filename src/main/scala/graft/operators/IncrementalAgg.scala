package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped count/sum aggregates — the
  * standing-report pattern: a 100 TB fact table's per-group totals are
  * kept as a small materialized aggregate and UPDATED from each delta
  * batch (inserts and retractions), never recomputed from the facts.
  *
  * Delta rows carry a sign column (+1 insert / -1 retract). Cost per
  * batch: one partial-aggregated hash agg of the DELTA plus one outer
  * join on |groups| rows — the base facts are never rescanned. Groups
  * whose maintained count reaches zero drop out of the view; callers
  * must not retract rows that were never inserted (counts would go
  * negative and the group silently drops — garbage in, garbage out, as
  * with any IVM scheme).
  *
  * Sums are maintained in whatever numeric type the caller supplies;
  * pass DECIMAL sum columns when exact cross-engine totals matter
  * (float sums re-associate under IVM by construction).
  */
object IncrementalAgg {

  /** `baseAgg`: (keys..., cntCol, sum columns). `delta`: (keys...,
    * signCol, the same sum columns as raw addends). Returns the
    * maintained aggregate with the same schema as `baseAgg`. */
  def applyDelta(baseAgg: DataFrame, delta: DataFrame, keys: Seq[String],
                 cntCol: String, sumCols: Seq[String],
                 signCol: String = "sign"): DataFrame = {
    require(keys.nonEmpty, "applyDelta: need at least one key column")
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as(s"__d_$cntCol"),
        sumCols.map(c =>
          sum(col(c) * col(signCol)).as(s"__d_$c")): _*)
    val merged = baseAgg.join(dAgg, keys, "full_outer")
    val zero = lit(0L)
    merged.select(
      keys.map(col) ++
        Seq((coalesce(col(cntCol), zero) + coalesce(col(s"__d_$cntCol"), zero))
          .as(cntCol)) ++
        sumCols.map { c =>
          val base = col(c)
          val d = col(s"__d_$c")
          coalesce(base + d, base, d).as(c)
        }: _*)
      .filter(col(cntCol) > 0)
  }
}
