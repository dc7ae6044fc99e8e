package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differ for push-pattern metadata ETL: the reference
  * republishes the whole extracted catalog every run (reference
  * job/sample_mysql_aws_sqs_job.py — each cron tick pushes the full
  * node/relation set); at warehouse scale the consumer wants the DELTA.
  * Classifies every key of two snapshots as insert / delete / update /
  * same with ONE null-safe full-outer join — no driver state, no
  * per-key lookups, shuffles only on the snapshot key.
  *
  * At 100 TB: both sides pre-partition on the key (or are read from
  * bucketed layouts) so the join co-locates; the `same` class is the
  * overwhelming majority and is typically filtered immediately after,
  * which Catalyst pushes into the join's output projection.
  */
object SnapshotDiff {

  /** Returns `keyCols` + `change_type` for every key present in either
    * snapshot. `compareCols` define value identity: any null-safe
    * difference → `update`. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // a key column in compareCols would reference __new_<key>, which is
    // never created (keys are not renamed) — fail loud, not with an
    // unresolved-column analysis error downstream
    require(keyCols.intersect(compareCols).isEmpty,
      s"keyCols and compareCols must be disjoint; both contain " +
        keyCols.intersect(compareCols).mkString(", "))
    val reserved = compareCols.map(c => s"__new_$c") ++ Seq("__in_old", "__in_new")
    val clash = reserved.filter((oldDf.columns ++ newDf.columns).contains)
    require(clash.isEmpty,
      s"input columns collide with diff internals: ${clash.mkString(", ")}")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ compareCols).map(c =>
      col(c).as(if (keyCols.contains(c)) c else s"__new_$c")): _*)
      .withColumn("__in_new", lit(true))
    val changed: Column = compareCols
      .map(c => !(col(c) <=> col(s"__new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("same")).as("change_type"): _*)
  }
}
