package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB ingest needs: incremental / streaming writers accumulate
  * thousands of tiny parquet files per partition, and each one costs a
  * task, a footer read, and a namenode round-trip on every downstream
  * scan. Compaction rewrites a directory into ~`targetBytes` files.
  *
  * Scale shape: the file count is derived from the directory's actual
  * byte size (one filesystem listing — no data read), the rewrite is a
  * single `repartition(n)` round-robin shuffle (each output task writes
  * one file of ~target size, so the result is balanced regardless of
  * input fragmentation), and the write goes to a NEW directory — the
  * caller swaps it in atomically (rename) or repoints the reader;
  * compact-in-place would destroy the input on a mid-write failure.
  */
object Compaction {

  /** Rewrite the parquet directory `inDir` as ~`targetBytes`-sized
    * files under `outDir` (must not be the input). Returns the number
    * of output files written.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(new Path(outDir) != new Path(inDir),
      "compact writes to a NEW directory; in-place would destroy the input on failure")
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(inDir)).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new Path(outDir))
      .count(st => st.getPath.getName.endsWith(".parquet"))
  }

  /** Read back a compacted directory (convenience for the swap-side). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)
}
