package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{GraphNode, GraphRelation}

/** CSV staging of the graph (SURVEY §2.A rows S4/S5): the durable
  * task→publisher handoff medium the reference uses
  * (FsNeo4jCSVLoader dirs wired at /root/reference/job/
  * sample_mysql_aws_sqs_job.py:43-45,54-57; header contract echoed at
  * publisher/aws_sqs_csv_puiblisher.py:44-51).
  *
  * Headers follow the reference contract (KEY, LABEL / START_KEY,
  * START_LABEL, END_KEY, END_LABEL, TYPE, REVERSE_TYPE). Files are
  * sharded by label/type directory — the Spark analogue of the
  * reference's one-CSV-per-label-shard layout — via partitionBy, which
  * also gives partition pruning on read-back.
  *
  * Empty-vs-null (SURVEY §7 hard-part 6): the reference reads staged
  * CSVs with pandas na_filter=False, so empty cells stay "".
  * `emptyValue`/`nullValue` below pin Spark to the same round-trip:
  * empty strings survive as empty strings.
  */
object CsvGraphStage {

  private def writer(df: DataFrame, dir: String, shardCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(shardCol)
      .option("header", "true")
      .option("emptyValue", "")
      .csv(dir)

  def writeNodes(nodes: Dataset[GraphNode], dir: String): Unit =
    writer(nodes.toDF().select(
      col("key").as("KEY"), col("name").as("name"), col("label").as("LABEL")),
      dir, "LABEL")

  def writeRelations(relations: Dataset[GraphRelation], dir: String): Unit =
    writer(relations.toDF().select(
      col("startKey").as("START_KEY"), col("startLabel").as("START_LABEL"),
      col("endKey").as("END_KEY"), col("endLabel").as("END_LABEL"),
      col("reverseType").as("REVERSE_TYPE"), col("relType").as("TYPE")),
      dir, "TYPE")

  def readNodes(spark: SparkSession, dir: String): Dataset[GraphNode] = {
    import spark.implicits._
    spark.read.option("header", "true").option("emptyValue", "").csv(dir)
      .select($"KEY".as("key"), $"LABEL".as("label"), $"name".as("name"))
      .as[GraphNode]
  }

  def readRelations(spark: SparkSession, dir: String): Dataset[GraphRelation] = {
    import spark.implicits._
    spark.read.option("header", "true").option("emptyValue", "").csv(dir)
      .select($"START_KEY".as("startKey"), $"START_LABEL".as("startLabel"),
        $"END_KEY".as("endKey"), $"END_LABEL".as("endLabel"),
        $"TYPE".as("relType"), $"REVERSE_TYPE".as("reverseType"))
      .as[GraphRelation]
  }
}
