package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the min/max-per-file data-skipping index
  * Delta/Iceberg/Hudi keep in table metadata, built here as a plain
  * DataFrame over any parquet directory. Partition pruning skips whole
  * directories; zone maps skip FILES inside a partition whose value
  * range can't match, which is the difference between "read the whole
  * month" and "read 3 of its 400 files" for range predicates over
  * roughly clustered data (ingest time, monotonically assigned ids,
  * Z-ordered layouts — see functions/ZOrder).
  *
  * Scale shape: building stats is one pass whose shuffle carries ONE
  * row per (file, stat columns) — O(files), never O(rows). Pruning
  * evaluates the predicate against that tiny table on the driver; the
  * collected list is the same cardinality every table-format planner
  * materializes at planning time, so the collect is planning, not data
  * movement. The pruned scan then opens only surviving files.
  */
object ZoneMaps {

  /** Per-file stats (row count + min/max per requested column) in one
    * partially-aggregated pass. Persist this next to the data and
    * rebuild incrementally on ingest (new files only — stats rows are
    * per-file, so append-only data means append-only stats). */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats: need at least one stats column")
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min,max] range can contain a value in [lo, hi].
    * Files where the column is entirely null have null min/max and are
    * dropped — correct for range predicates, which no null matches. */
  def pruneFiles(stats: DataFrame, colName: String, lo: Any, hi: Any): Array[String] = {
    import org.apache.spark.sql.Encoders
    stats.filter(!(col(s"max_$colName") < lit(lo) || col(s"min_$colName") > lit(hi)))
      .select(col("file")).as(Encoders.STRING).collect()
  }

  /** Range scan that opens ONLY files the zone map can't rule out,
    * with the residual predicate re-applied (zone maps prove absence,
    * not presence). `basePath` keeps hive partition columns alive on
    * the per-file read and anchors the schema when everything prunes.
    */
  def skipScan(spark: SparkSession, basePath: String, stats: DataFrame,
               colName: String, lo: Any, hi: Any): DataFrame = {
    val files = pruneFiles(stats, colName, lo, hi)
    val scan =
      if (files.isEmpty) spark.read.parquet(basePath).filter(lit(false))
      else spark.read.option("basePath", basePath).parquet(files.toIndexedSeq: _*)
    scan.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** Targeted delete (the GDPR-erasure / right-to-be-forgotten shape):
    * remove every row with `keyCol == key`, rewriting ONLY the files
    * whose zone-map range can contain the key — on a 100 TB table
    * clustered by the key family this touches a handful of files while
    * every other file keeps its exact bytes (object-store etags, cache
    * entries, downstream manifests stay valid). Returns one report row
    * `(files_total, files_rewritten, files_dropped, rows_deleted)`.
    *
    * Mechanics per hit file: read THAT file, filter the key out,
    * rewrite in place via temp-and-rename (a file that loses all its
    * rows is deleted, not rewritten empty). The driver loop is over
    * the pruned file list — O(hit files), which is exactly the
    * quantity the zone map minimizes; the rewrites themselves are
    * distributed reads/writes. NOT transactional across files (that is
    * a table format's job); callers needing atomicity stage into a new
    * directory instead.
    *
    * STATS INVALIDATION: the caller's `stats` frame is STALE after this
    * returns — dropped files still appear in it (a later pruneFiles /
    * skipScan would try to open them and fail) and rewritten files keep
    * their pre-delete min/max (safe for pruning — ranges only widened —
    * but imprecise). Recompute the zone map over the directory
    * ([[fileStats]]) after any delete before reusing it.
    */
  def targetedDelete(spark: SparkSession, stats: DataFrame,
                     keyCol: String, key: Any): DataFrame = {
    import org.apache.hadoop.fs.Path
    val allFiles = stats.select(col("file")).as(org.apache.spark.sql.Encoders.STRING)
      .collect()
    val hits = pruneFiles(stats, keyCol, key, key)
    val conf = spark.sparkContext.hadoopConfiguration
    var rewritten = 0L
    var dropped = 0L
    var rowsDeleted = 0L
    hits.foreach { f =>
      val path = new Path(f)
      val fs = path.getFileSystem(conf)
      val in = spark.read.parquet(f)
      val keep = in.filter(!(col(keyCol) <=> lit(key))).cache()
      try {
        val before = in.count()
        val after = keep.count()
        if (after == before) () // zone-map false positive: leave the file alone
        else if (after == 0L) { fs.delete(path, false); dropped += 1; rowsDeleted += before }
        else {
          val tmp = new Path(path.getParent, s".rewrite_${path.getName}")
          keep.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = fs.listStatus(tmp).map(_.getPath)
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no parquet part under $tmp"))
          fs.delete(path, false)
          fs.rename(part, path)
          fs.delete(tmp, true)
          rewritten += 1
          rowsDeleted += before - after
        }
      } finally keep.unpersist()
    }
    import spark.implicits._
    Seq((allFiles.length.toLong, rewritten, dropped, rowsDeleted))
      .toDF("files_total", "files_rewritten", "files_dropped", "rows_deleted")
  }
}
