package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, pmod, xxhash64}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB ingest needs: incremental / streaming writers accumulate
  * thousands of tiny parquet files per partition, and each one costs a
  * task, a footer read, and a namenode round-trip on every downstream
  * scan. Compaction rewrites a directory into ~`targetBytes` files.
  *
  * Scale shape: the file counts are derived from the directory's actual
  * byte sizes (one recursive filesystem listing — no data read), the
  * rewrite is a single shuffle (each output task writes ~one file of
  * ~target size, so the result is balanced regardless of input
  * fragmentation), and the write goes to a NEW directory — the caller
  * swaps it in atomically (rename) or repoints the reader;
  * compact-in-place would destroy the input on a mid-write failure.
  *
  * Hive-partitioned input (`lang=en/…` layout) is PRESERVED: partition
  * columns are auto-detected from the directory structure (or passed
  * explicitly), per-partition file counts come from per-partition byte
  * sizes, and the output is written with `partitionBy` so downstream
  * partition pruning and dynamic partition pruning still work on the
  * compacted copy. Rows are routed to output files by a DETERMINISTIC
  * hash of the data columns (never `rand()` — a non-deterministic
  * repartition key loses or duplicates rows when a failed task is
  * recomputed on a different sample).
  */
object Compaction {

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Rewrite the parquet directory `inDir` as ~`targetBytes`-sized
    * files under `outDir` (must not alias or nest the input). Returns
    * the number of output data files written.
    *
    * `partitionCols`: `None` auto-detects hive partitioning from the
    * directory layout (consistent `k=v` directory levels); `Some(Nil)`
    * forces the flat path; `Some(cols)` pins the expected layout.
    * Partition values are unescaped the way Spark escapes them (%XX)
    * and `__HIVE_DEFAULT_PARTITION__` maps to null, so null-keyed
    * partitions compact correctly (null-safe join below).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     partitionCols: Option[Seq[String]] = None): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val inFs = new Path(inDir).getFileSystem(conf)
    // qualify AND normalize: Hadoop Path keeps ".." segments, so a
    // dot-dot alias of the input would slip past a plain compare
    def canon(dir: String): Path = {
      val p = new Path(dir)
      new Path(p.getFileSystem(conf).makeQualified(p).toUri.normalize())
    }
    val inQ = canon(inDir)
    val outQ = canon(outDir)
    // qualified-path compare: a bare-vs-scheme-qualified or relative
    // alias of the same directory must be caught, and either direction
    // of nesting is fatal (mode=overwrite deletes outDir first — a
    // nested inDir would be destroyed before it is read)
    def isAncestorOrSelf(a: Path, b: Path): Boolean = {
      var p = b
      while (p != null) { if (p == a) return true; p = p.getParent }
      false
    }
    require(!isAncestorOrSelf(inQ, outQ) && !isAncestorOrSelf(outQ, inQ),
      s"compact writes to a NEW directory (got in=$inQ out=$outQ); " +
        "in-place or nested would destroy the input on failure")

    val parts = partitionCols.getOrElse(detectPartitionCols(inFs, inQ))
    val df = spark.read.parquet(inDir)

    if (parts.isEmpty) {
      val totalBytes = inFs.getContentSummary(inQ).getLength
      val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      df.repartition(n).write.mode("overwrite").parquet(outDir)
    } else {
      require(parts.forall(df.columns.contains),
        s"partition columns ${parts.mkString(",")} not all present in schema")
      // one listing pass: leaf partition dir -> byte size -> file count
      val leaves = leafSizes(inFs, inQ, parts.length)
      val withN = leaves.map { case (vs, bytes) =>
        (vs, math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
      }
      val totalN = withN.map(_._2).sum
      // broadcast the (partition values -> file count) table; values are
      // cast from their dir-name strings to the read schema's types, the
      // same parse Spark itself applies to partition dirs
      val pvCols = parts.map(_ + "__graft_pv")
      val schema = StructType(
        pvCols.map(StructField(_, StringType)) :+ StructField("__graft_nf", IntegerType))
      val rows = withN.map { case (vs, nf) =>
        Row.fromSeq(vs.map(v =>
          if (v == HiveDefaultPartition) null else unescapePathName(v)) :+ nf)
      }
      var counts = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      parts.zip(pvCols).foreach { case (p, pv) =>
        counts = counts.withColumn(pv, col(pv).cast(df.schema(p).dataType))
      }
      val dataCols = df.columns.filterNot(parts.contains).toSeq
      val saltBase = if (dataCols.isEmpty) lit(0L) else xxhash64(dataCols.map(col): _*)
      val joinCond = parts.zip(pvCols).map { case (p, pv) => col(p) <=> col(pv) }
        .reduce(_ && _)
      df.join(broadcast(counts), joinCond, "left")
        .withColumn("__graft_salt",
          pmod(saltBase, coalesce(col("__graft_nf"), lit(1)).cast("long")))
        // hash-repartition on (partition cols, salt): every output file
        // group lands whole in one task, and partitionBy splits tasks
        // per partition value — each leaf gets ~ceil(bytes/target) files
        .repartition(totalN, (parts.map(col) :+ col("__graft_salt")): _*)
        .select(df.columns.map(col): _*)
        .write.mode("overwrite").partitionBy(parts: _*).parquet(outDir)
    }
    countParquetFiles(inFs, outQ)
  }

  /** Hive partition columns implied by the directory layout: one column
    * per directory level where EVERY visible entry is a `k=v` directory
    * with a consistent key. Stops at the first level holding data files.
    */
  def detectPartitionCols(fs: FileSystem, dir: Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var cur = dir
    var descend = true
    while (descend) {
      val entries = fs.listStatus(cur).filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      val dirs = entries.filter(_.isDirectory)
      val keys = dirs.map(_.getPath.getName).flatMap { n =>
        val i = n.indexOf('=')
        if (i > 0) Some(n.substring(0, i)) else None
      }
      if (entries.nonEmpty && dirs.length == entries.length &&
          keys.length == dirs.length && keys.toSeq.distinct.length == 1) {
        out += keys.head
        cur = dirs.head.getPath
      } else descend = false
    }
    out.toSeq
  }

  private def leafSizes(fs: FileSystem, dir: Path, depth: Int): Seq[(Seq[String], Long)] =
    if (depth == 0) {
      Seq(Seq.empty[String] -> fs.listStatus(dir).filter(_.isFile).map(_.getLen).sum)
    } else {
      fs.listStatus(dir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
        }
        .flatMap { st =>
          val name = st.getPath.getName
          val v = name.substring(name.indexOf('=') + 1)
          leafSizes(fs, st.getPath, depth - 1).map { case (vs, b) => (v +: vs) -> b }
        }
    }

  private def countParquetFiles(fs: FileSystem, dir: Path): Int =
    fs.listStatus(dir).toSeq.map { st =>
      val n = st.getPath.getName
      if (st.isDirectory && !n.startsWith("_") && !n.startsWith(".")) countParquetFiles(fs, st.getPath)
      else if (st.isFile && n.endsWith(".parquet")) 1
      else 0
    }.sum

  /** Reverse of Spark's partition-dir escaping: %XX byte sequences
    * back to characters (ASCII-range escapes, which is what Spark
    * emits for the reserved path characters it escapes).
    */
  private[sources] def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch {
          case _: NumberFormatException => sb.append(c); i += 1
        }
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Read back a compacted directory (convenience for the swap-side). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)
}
