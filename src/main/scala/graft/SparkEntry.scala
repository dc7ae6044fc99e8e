package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query (SURVEY §2.C Q1–Q24) plus the
  * mandated extension operators (§2.B). Each key has a DataFrame plan in
  * `queries` and, where cross-engine-deterministic, DuckDB oracle SQL in
  * `oracleSql` (column names and types aligned on both sides).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.defs, Relational.oracle),
      (TextDocs.defs, TextDocs.oracle),
      (Vectors.defs, Vectors.oracle),
      (Events.defs, Events.oracle),
      (GraphQ.defs, GraphQ.oracle),
      (Extras.defs, Extras.oracle),
      (SqlPath.defs, SqlPath.oracle),
      (StatsQ.defs, StatsQ.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** BENCH-ONLY entries: timed by Bench.scala alongside `queries`,
    * excluded from Verify.scala/the driver's oracle compare — each def
    * documents why a value oracle would be a flake (today: exactly the
    * production-k compacting-sketch configuration, whose bound
    * selection is partition-order-dependent). Disjoint from `queries`
    * by construction (QueriesSmokeSpec pins it). */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    StatsQ.benchOnlyDefs
}
