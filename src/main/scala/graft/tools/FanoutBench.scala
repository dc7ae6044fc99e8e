package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev tool closing ADVICE r15 / round-16 verdict item 7: MEASURE the
  * cost of [[graft.operators.Stats]] uniqueKeyedFanout's unconditional
  * `repartition(par, __k)` on a source that is ALREADY well-partitioned
  * (≥ defaultParallelism splits), against the default few-split sf
  * parquet. The builder's standing rationale — AQE collapses a bare
  * groupBy's exchange to ONE partition on the narrow keyed rows, so
  * the fanout needs an explicit width pin anyway, and the exchange
  * ships only (key, value) pairs it must shuffle either way — predicts
  * ~equal wall time on both sources; this prints the numbers so
  * BASELINE.md can carry a measurement instead of an argument.
  *
  * Method: the x_bootstrap query body (bootstrapMeanCI over orders'
  * o_totalprice, B = 200 — the (B+1)× explode rides the fanout's
  * exchange) timed min-of-3 on (a) the stock sf parquet (one file →
  * few input splits) and (b) a 32-file copy of the same rows written
  * once to a temp dir (the "pre-partitioned 100 TB source" stand-in).
  * Usage: runMain graft.tools.FanoutBench [sfDir]
  */
object FanoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus, appName = "graft-fanout-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val par = spark.sparkContext.defaultParallelism

    val stock = Tables.load(spark, sfDir, "orders")
    val wideDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_fanout_bench_p${ProcessHandle.current().pid()}")
    // the many-split source: SAME rows, par files (hash-spread by the
    // bootstrap key so every split carries every key range)
    stock.repartition(par, col("o_orderkey"))
      .write.mode("overwrite").parquet(wideDir.getAbsolutePath)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(wideDir): Unit))
    val wide = spark.read.parquet(wideDir.getAbsolutePath)

    def body(df: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.Stats.bootstrapMeanCI(
        df.filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull),
        "o_totalprice", "o_orderkey", b = 200).collect(): Unit

    def minOf3(df: org.apache.spark.sql.DataFrame): Double = {
      body(df) // untimed warmup (codegen/JIT)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body(df)
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val splitsStock = stock.rdd.getNumPartitions
    val splitsWide = wide.rdd.getNumPartitions
    val tStock = minOf3(stock)
    val tWide = minOf3(wide)
    spark.stop()
    println(f"""{"metric":"fanout_repartition","sf":"$sfDir","par":$par,""" +
      f""""stock_splits":$splitsStock,"stock_sec":$tStock%.3f,""" +
      f""""wide_splits":$splitsWide,"wide_sec":$tWide%.3f,""" +
      f""""wide_over_stock":${tWide / tStock}%.3f}""")
  }
}
