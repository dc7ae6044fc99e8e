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
  *
  * Stability: queries slower than `rerunThreshold` are run three times
  * and report the MEDIAN — multi-second iterative queries (dedup label
  * propagation) showed 8× tail-latency swings under a loaded harness
  * when sampled once. A query that throws is reported as -1 and listed
  * under "failed" so a broken query can't masquerade as a fast one.
  */
object Bench {
  private val rerunThreshold = 2.0 // seconds

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
    // warm the iterative dedup path (shingle/minhash codegen, the
    // checkpoint machinery, the per-round scheduler round-trips) at the
    // smallest SF: the round-2 driver recorded a 19.3 s tail for
    // x_dedup_corpus whose re-runs measured 1-8 s — first-execution
    // JVM/codegen warmup on an 8-stage iterative job is exactly the
    // kind of cost a single-plan warmup query doesn't amortize.
    val warmDir = new java.io.File(sfDir).getParentFile
    val sf001 = new java.io.File(warmDir, "sf0.001")
    if (sf001.isDirectory) {
      try SparkEntry.queries("x_dedup_corpus")(spark, sf001.getAbsolutePath)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    }

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = timeOnce(name, fn)
      val dt =
        if (first < 0) first
        else if (first <= rerunThreshold) first
        else {
          // a failure on ANY rerun marks the query failed — dropping it
          // from the sample would silently report max-of-2 as "median"
          // and let a flaky query masquerade as healthy
          val reruns = Seq.fill(2)(timeOnce(name, fn))
          if (reruns.exists(_ < 0)) -1.0
          else (first +: reruns).sorted.apply(1)
        }
      System.err.println(f"[bench] $name%-22s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failedJson = if (failed.isEmpty) "" else failed.mkString(""","failed":[""", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
