package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.SparkEntry

/** Dev tool: dump formatted physical plans for selected queries so the
  * pushdown/pruning/join-strategy story can be inspected and iterated
  * (SURVEY §4). Usage: runMain graft.tools.Explain [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, 8, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter", "q03_left_join", "q05_sort_limit", "q07_agg",
        "q12_topk_group", "q14_anti_join", "q18_cosine_pairs", "x_ann_topk", "q22_asof")
    val out = new StringBuilder
    names.foreach { n =>
      out.append(s"\n========== $n ==========\n")
      out.append(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/explain.txt"), out.toString)
    println(s"wrote /tmp/explain.txt (${out.length} chars)")
    spark.stop()
  }
}
