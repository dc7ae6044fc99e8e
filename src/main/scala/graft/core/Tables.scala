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
