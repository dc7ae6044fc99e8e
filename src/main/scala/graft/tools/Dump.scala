package graft.tools

import java.nio.file.{Files, Paths}

import graft.core.Sessions
import graft.SparkEntry

/** Dev tool: dump a SUBSET of the declared queries with the same
  * parquet + oracle_sql.json layout as [[graft.Verify]], so one new
  * query can be checked against DuckDB without the full sweep.
  * Usage: runMain graft.tools.Dump /tmp/vout1 name [name ...]
  * (sf dir via SPARK_GRAFT_SF_DIR, default sf0.01)
  */
object Dump {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(16, 16, "graft-dump")
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
