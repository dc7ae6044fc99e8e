package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-delimited JSON (JSONL) corpus source/sink — the lingua franca
  * interchange format for LLM training corpora (one document object per
  * line). Spark's json source is already the right engine for it at
  * 100 TB: line-delimited input splits by newline, so a directory of
  * large .jsonl(.gz → use a splittable codec like zstd/bzip2 for
  * parallel reads) files scans fully in parallel, and the writer emits
  * one shard per task.
  *
  * Always pass the schema on read: schema inference runs an extra full
  * pass over the data and can widen/narrow types per file — at corpus
  * scale that is both a second scan of everything and a correctness
  * hazard.
  */
object JsonlCorpus {

  /** Write a corpus as JSONL shards (one JSON object per line). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL corpus with an explicit schema (no inference pass).
    * Rows that fail to parse surface in `_corrupt_record` under the
    * default PERMISSIVE mode; pass FAILFAST to refuse a corrupt corpus.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)
}
