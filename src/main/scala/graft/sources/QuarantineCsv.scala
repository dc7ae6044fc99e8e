package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Malformed-row quarantine for CSV ingest — the production PERMISSIVE
  * pattern: rows that fail the declared schema are NOT dropped
  * (DROPMALFORMED silently loses data) and do NOT kill the job
  * (FAILFAST turns one bad upstream export into an outage); they land
  * in a quarantine side-channel with the raw line preserved for
  * replay after the producer is fixed.
  *
  * Mechanics: the scan runs PERMISSIVE with an appended
  * `_corrupt_record` column — a malformed row parses as all-null data
  * columns plus the raw line; a well-formed row has a null raw line.
  * [[readWithQuarantine]] returns ONE frame with an `is_corrupt` flag
  * so the caller routes both classes in a single pass
  * (`partitionBy("is_corrupt")` write, or two filtered writes of the
  * same cached scan) — never two scans of the input.
  *
  * Spark caveat, handled here: since Spark 2.3 a query may not
  * reference ONLY the corrupt-record column of a CSV scan (the parser
  * prunes data columns and would report nothing corrupt), so the flag
  * derives from the full-width frame; callers filtering the
  * quarantine side should keep at least one data column or operate on
  * the returned frame as-is.
  */
object QuarantineCsv {

  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE scan of `dir` against `schema`, with `is_corrupt` and
    * the raw `_corrupt_record` line appended. `schema` must NOT
    * already contain the corrupt column. */
  def readWithQuarantine(spark: SparkSession, dir: String,
                         schema: StructType, header: Boolean = true): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is appended by the reader")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .option("header", header.toString)
      .option("maxCharsPerColumn", "-1")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(dir)
      .withColumn("is_corrupt", col(CorruptCol).isNotNull)
  }

  /** JSONL sibling: PERMISSIVE line-JSON scan with the same corrupt
    * side-channel and flag. JSON has an extra failure class CSV lacks
    * — a syntactically valid object whose field fails the declared
    * type — which also lands in quarantine with the raw line. */
  def readJsonlWithQuarantine(spark: SparkSession, dir: String,
                              schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is appended by the reader")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .json(dir)
      .withColumn("is_corrupt", col(CorruptCol).isNotNull)
  }

  /** Split helper for callers who want the two frames: (clean rows
    * with data columns only, quarantined raw lines). Both filters read
    * the SAME scan — pair with `.cache()` or a single partitioned
    * write to keep it one input pass. */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val clean = parsed.filter(!col("is_corrupt"))
      .drop(CorruptCol, "is_corrupt")
    val quarantine = parsed.filter(col("is_corrupt"))
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }
}
