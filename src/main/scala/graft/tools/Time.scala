package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Sessions, Tables}
import graft.SparkEntry

/** Dev tool: time a subset of the declared queries with the same
  * noop-write protocol as [[graft.Bench]], so a single query's cost can
  * be iterated on without the full 96-query sweep.
  * Usage: runMain graft.tools.Time [-sf dir] name [name ...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = args.toSeq match {
      case Seq("-sf", d, rest @ _*) => (d, rest)
      case rest                     => ("/root/testdata/sf0.1", rest)
    }
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus, appName = "graft-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n%-22s min ${runs.min}%6.2f s  runs ${runs.map(r => f"$r%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
