package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test-data star schema (TESTDATA.md / FIXTURES.md §1).
  *
  * All loads are plain parquet scans: Catalyst handles column pruning and
  * predicate pushdown into the scan, so callers just compose DataFrame
  * ops on top. At 100 TB these would be partitioned-directory datasets;
  * the API is path-based so nothing here changes.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Scale-adaptive fan-out for a CPU-heavy narrow stage: repartition to
    * the session's parallelism only when the frame's planned layout is
    * narrower. A small or single-row-group parquet file plans as one
    * scan task, so every per-row expression downstream (regex chains,
    * merge loops, pair scoring) would serialize through one core; an
    * already many-split source passes through untouched — no exchange
    * is added where the scan is wide (guide §2.5, input-skew remedies).
    * Inspecting the planned partition count is planning-time only (no
    * job runs).
    */
  def spread(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }

  /** events.ts arrives in whatever physical form the data generator
    * chose — TIMESTAMP(NANOS) (surfaced as a nanosecond long under
    * spark.sql.legacy.parquet.nanosAsLong, set in [[Sessions]]) or a
    * no-timezone timestamp[us] (surfaced as TIMESTAMP_NTZ). Normalize
    * both to a microsecond TimestampType column so downstream epoch
    * arithmetic (unix_micros/unix_seconds, watermark builders) sees one
    * type. The NTZ→TZ cast is value-exact here: the session timezone is
    * pinned to UTC ([[Sessions.configure]]), so the wall-clock reading
    * IS the UTC instant.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: epoch-ns exceeds double's 2^53 exact
        // range, so float division would be off by ±1 µs.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already TimestampType
    }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
