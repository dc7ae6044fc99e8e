package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Similarity

/** Dev tool for round-17 verdict item 5's measurement half: the
  * cell-PARTITIONED hard-negative mining layout vs the same operator
  * on a FLAT layout, same rows, same code path
  * ([[Similarity.hardNegativesIvfPartitioned]] both times — only the
  * storage layout differs, so the delta isolates what dynamic
  * partition pruning buys on the candidate scan).
  *
  * Method: embeddings at the given SF, 16 coarse cells (the
  * x_hard_negatives_part configuration), nprobe = 4, query batch =
  * vec_id % 8. Layout A = hive cell-partitioned
  * ([[Similarity.cellPartitionedCorpus]] — DPP prunes unprobed cell
  * directories, PlanSpec-locked). Layout B = the identical frame
  * written FLAT (cell as an ordinary column — every file read, the
  * pre-ingest state). Min-of-3 after an untimed warmup, full plan
  * executed via a noop write. At the test SFs the corpus is a handful
  * of files so the absolute delta is small; the 100 TB claim rides the
  * PLAN SHAPE (files skipped scale with corpus size, the x_dpp_join
  * argument) — this prints the measured numbers so BASELINE.md carries
  * a measurement instead of an extrapolation alone.
  * Usage: runMain graft.tools.CellPruneBench [sfDir]
  */
object CellPruneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus, appName = "graft-cellprune-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.load(spark, sfDir, "embeddings")
    val cells = 16
    val coarse = Similarity.pqCodebook(
      e.filter(col("vec_id").between(1, cells)), "vec_id", "embedding",
      numSubspaces = 1, codebookSize = cells)(0)
    val part = Similarity.cellPartitionedCorpus(spark, sfDir, e,
      "vec_id", "embedding", "label", coarse)
    // flat twin: SAME columns (cell demoted to an ordinary column),
    // one unpartitioned dir — nothing for DPP to prune
    val flatDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_cellprune_flat_p${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(flatDir): Unit))
    part.write.mode("overwrite").parquet(flatDir.getAbsolutePath)
    val flat = spark.read.parquet(flatDir.getAbsolutePath)

    def body(df: org.apache.spark.sql.DataFrame): Unit =
      Similarity.hardNegativesIvfPartitioned(df, "vec_id", "embedding",
          "label", "cell", k = 3, coarse, nprobe = 4,
          col("vec_id") % 8 === 0)
        .write.format("noop").mode("overwrite").save()

    def minOf3(df: org.apache.spark.sql.DataFrame): Double = {
      body(df) // untimed warmup (codegen/JIT)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body(df)
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val tPart = minOf3(part)
    val tFlat = minOf3(flat)
    spark.stop()
    println(f"""{"metric":"cell_prune","sf":"$sfDir","cells":$cells,"nprobe":4,""" +
      f""""partitioned_sec":$tPart%.3f,"flat_sec":$tFlat%.3f,""" +
      f""""part_over_flat":${tPart / tFlat}%.3f}""")
  }
}
