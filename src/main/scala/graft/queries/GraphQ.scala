package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphExpansion

/** Q20 — the reference's end-to-end query (SURVEY §2.C): flat
  * information_schema-shaped rows → TableMetadata → graph nodes and
  * relations. Runs over the committed fixture CSV (FIXTURES.md §2);
  * the DuckDB oracle builds the same graph in pure SQL from the same
  * file.
  */
object GraphQ {
  private type Q = (SparkSession, String) => DataFrame

  val fixturePath = "/root/repo/src/test/resources/fixtures/columns_meta.csv"

  /** Fixture read: header CSV; Spark's default CSV nullValue turns
    * empty description cells into nulls, matching DuckDB's read_csv. */
  def readColumnsMeta(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read.option("header", "true").csv(path)

  val defs: Map[String, Q] = Map(
    "q20_graph_nodes" -> ((s, _) => {
      val tables = GraphExpansion.tableMetadata(s, readColumnsMeta(s))
      GraphExpansion.nodes(s, tables).toDF()
        .select(col("key"), col("label"), col("name"))
        .orderBy("label", "key", "name")
    }),

    "q20_graph_relations" -> ((s, _) => {
      val tables = GraphExpansion.tableMetadata(s, readColumnsMeta(s))
      GraphExpansion.relations(s, tables).toDF()
        .select(col("startKey").as("start_key"), col("startLabel").as("start_label"),
          col("endKey").as("end_key"), col("endLabel").as("end_label"),
          col("relType").as("type"), col("reverseType").as("reverse_type"))
        .orderBy("type", "start_key", "end_key")
    })
  )

  private val csv = s"read_csv('$fixturePath', header=true)"

  val oracle: Map[String, String] = Map(
    "q20_graph_nodes" ->
      s"""WITH cm AS (SELECT * FROM $csv),
         |t AS (
         |  SELECT DISTINCT database, cluster, schema_name, table_name, table_description, is_view
         |  FROM cm
         |)
         |SELECT * FROM (
         |  SELECT DISTINCT 'database://' || database AS key, 'Database' AS label, database AS name FROM t
         |  UNION ALL
         |  SELECT DISTINCT database || '://' || cluster, 'Cluster', cluster FROM t
         |  UNION ALL
         |  SELECT DISTINCT database || '://' || cluster || '.' || schema_name, 'Schema', schema_name FROM t
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name, 'Table', table_name FROM t
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name || '/_description',
         |         'Description', table_description
         |  FROM t WHERE table_description IS NOT NULL
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name || '/' || col_name,
         |         'Column', col_name
         |  FROM cm
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name || '/' || col_name || '/_description',
         |         'Description', col_description
         |  FROM cm WHERE col_description IS NOT NULL
         |) n
         |ORDER BY label, key, name""".stripMargin,
    "q20_graph_relations" ->
      s"""WITH cm AS (SELECT * FROM $csv),
         |t AS (
         |  SELECT DISTINCT database, cluster, schema_name, table_name, table_description FROM cm
         |)
         |SELECT * FROM (
         |  SELECT DISTINCT 'database://' || database AS start_key, 'Database' AS start_label,
         |         database || '://' || cluster AS end_key, 'Cluster' AS end_label,
         |         'CLUSTER' AS type, 'CLUSTER_OF' AS reverse_type FROM t
         |  UNION ALL
         |  SELECT DISTINCT database || '://' || cluster, 'Cluster',
         |         database || '://' || cluster || '.' || schema_name, 'Schema', 'SCHEMA', 'SCHEMA_OF' FROM t
         |  UNION ALL
         |  SELECT DISTINCT database || '://' || cluster || '.' || schema_name, 'Schema',
         |         database || '://' || cluster || '.' || schema_name || '/' || table_name, 'Table',
         |         'TABLE', 'TABLE_OF' FROM t
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name, 'Table',
         |         database || '://' || cluster || '.' || schema_name || '/' || table_name || '/_description',
         |         'Description', 'DESCRIPTION', 'DESCRIPTION_OF'
         |  FROM t WHERE table_description IS NOT NULL
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name, 'Table',
         |         database || '://' || cluster || '.' || schema_name || '/' || table_name || '/' || col_name,
         |         'Column', 'COLUMN', 'COLUMN_OF'
         |  FROM cm
         |  UNION ALL
         |  SELECT database || '://' || cluster || '.' || schema_name || '/' || table_name || '/' || col_name, 'Column',
         |         database || '://' || cluster || '.' || schema_name || '/' || table_name || '/' || col_name || '/_description',
         |         'Description', 'DESCRIPTION', 'DESCRIPTION_OF'
         |  FROM cm WHERE col_description IS NOT NULL
         |) r
         |ORDER BY type, start_key, end_key""".stripMargin
  )
}
