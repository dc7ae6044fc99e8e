package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.SparkEntry

/** Dev tool: dump one formatted-plan file per query, for the committed
  * plan evidence (plans/rNN/<query>_before|after.txt). Usage:
  * runMain graft.tools.ExplainTo <outDir> <suffix> name [name ...]
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = Sessions.configure(
      SparkSession.builder().master("local[8]"),
      shufflePartitions = 8, appName = "graft-explain-to").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val plan = SparkEntry.queries.getOrElse(n, SparkEntry.benchOnly(n))(
        spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
