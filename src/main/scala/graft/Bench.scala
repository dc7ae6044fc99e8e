package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Sessions, Tables}

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing uses a `noop`-format write so the whole plan executes —
  * `count()` would let Catalyst prune projections and skip sorts.
  * Tables are touched once first so parquet footers and the OS page
  * cache are warm (the driver measures engine time, not disk cold
  * start).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus, appName = "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count()) // warm cache
    // one throwaway query to amortize first-plan codegen/JIT so the
    // first timed query isn't charged for JVM warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
