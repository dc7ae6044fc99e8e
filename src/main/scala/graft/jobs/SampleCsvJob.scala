package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.core.{ScopedConf, Sessions}
import graft.sources.SqsPublisher

/** Runnable sample job — the analogue of the reference's
  * job/sample_*_job.py entry points, wired to the committed fixture
  * CSV instead of a live database so the full lifecycle (extract →
  * group → expand → stage CSVs → publish) can run anywhere.
  *
  * Usage: runMain graft.jobs.SampleCsvJob <workDir> [parity|chunked]
  *        [publish-only]
  *
  * Publishes through the in-memory Recording transport and prints what
  * was sent (message count, byte sizes, envelope head) — swap in a
  * real SQS transport for production.
  */
object SampleCsvJob {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_sample_job")
    val mode = if (args.length > 1) args(1) else "parity"
    val publishOnly = args.contains("publish-only")

    val spark = Sessions.configure(
      SparkSession.builder().master("local[4]"), shufflePartitions = 4,
      appName = "graft-sample-csv-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val conf = ScopedConf(
      "extractor.csv.path" -> graft.queries.GraphQ.fixturePath,
      "loader.csv.node_dir" -> s"$workDir/nodes",
      "loader.csv.relation_dir" -> s"$workDir/relationships",
      "publisher.awssqs.queue_url" -> "local://queue/metadata",
      "publisher.awssqs.chunked" -> (mode == "chunked").toString)

    val transport = new SqsPublisher.Recording
    val job = new MetadataJob(spark, conf, transport)
    if (publishOnly) job.publishStaged() else job.launch()

    println(s"[sample-job] mode=$mode publishOnly=$publishOnly " +
      s"messages=${transport.sent.size} succeeded=${job.succeeded}")
    transport.sent.zipWithIndex.foreach { case ((q, body, gid), i) =>
      println(s"[sample-job] msg#$i queue=$q group=$gid bytes=${body.getBytes("UTF-8").length}")
    }
    transport.sent.headOption.foreach { case (_, body, _) =>
      println(s"[sample-job] envelope head: ${body.take(220)}")
    }
    spark.stop()
  }
}
