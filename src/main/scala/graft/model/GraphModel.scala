package graft.model

/** Property-graph data model for table metadata (SURVEY §1.1).
  *
  * Mirrors the capability of the reference's inherited databuilder
  * model (TableMetadata → Amundsen-style nodes/relations; wiring at
  * /root/reference/job/sample_mysql_aws_sqs_job.py:43-57, header
  * contract at publisher/aws_sqs_csv_puiblisher.py:44-51) as typed
  * Scala case classes with Spark Encoders derived automatically.
  */
final case class ColumnMetadata(
    name: String,
    description: Option[String],
    colType: String,
    sortOrder: Int)

final case class TableMetadata(
    database: String,
    cluster: String,
    schema: String,
    name: String,
    description: Option[String],
    isView: Boolean,
    columns: Seq[ColumnMetadata]) {

  import Keys._

  def tableKey: String = Keys.tableKey(database, cluster, schema, name)

  /** G1 expansion: one TableMetadata → its graph nodes (SURVEY §2.A).
    * Database/Cluster/Schema nodes repeat across tables — the caller
    * dedups at the Dataset level. */
  def toNodes: Seq[GraphNode] = {
    val tk = tableKey
    val base = Seq(
      GraphNode(databaseKey(database), "Database", database),
      GraphNode(clusterKey(database, cluster), "Cluster", cluster),
      GraphNode(schemaKey(database, cluster, schema), "Schema", schema),
      GraphNode(tk, "Table", name)) ++
      description.map(d => GraphNode(descriptionKey(tk), "Description", d))
    val cols = columns.flatMap { c =>
      val ck = columnKey(tk, c.name)
      GraphNode(ck, "Column", c.name) +:
        c.description.map(d => GraphNode(descriptionKey(ck), "Description", d)).toSeq
    }
    base ++ cols
  }

  /** G2 expansion: forward + reverse typed relations. */
  def toRelations: Seq[GraphRelation] = {
    val tk = tableKey
    val base = Seq(
      GraphRelation(databaseKey(database), "Database",
        clusterKey(database, cluster), "Cluster", "CLUSTER", "CLUSTER_OF"),
      GraphRelation(clusterKey(database, cluster), "Cluster",
        schemaKey(database, cluster, schema), "Schema", "SCHEMA", "SCHEMA_OF"),
      GraphRelation(schemaKey(database, cluster, schema), "Schema",
        tk, "Table", "TABLE", "TABLE_OF")) ++
      description.map(_ => GraphRelation(tk, "Table",
        descriptionKey(tk), "Description", "DESCRIPTION", "DESCRIPTION_OF"))
    val cols = columns.flatMap { c =>
      val ck = columnKey(tk, c.name)
      GraphRelation(tk, "Table", ck, "Column", "COLUMN", "COLUMN_OF") +:
        c.description.map(_ => GraphRelation(ck, "Column",
          descriptionKey(ck), "Description", "DESCRIPTION", "DESCRIPTION_OF")).toSeq
    }
    base ++ cols
  }
}

final case class GraphNode(key: String, label: String, name: String)

final case class GraphRelation(
    startKey: String,
    startLabel: String,
    endKey: String,
    endLabel: String,
    relType: String,
    reverseType: String)

/** Hierarchical key scheme (SURVEY §2.A row R5): `db://cluster.schema/
  * table`, `…/table/col`, `…/_description`. */
object Keys {
  def databaseKey(db: String): String = s"database://$db"
  def clusterKey(db: String, cluster: String): String = s"$db://$cluster"
  def schemaKey(db: String, cluster: String, schema: String): String =
    s"$db://$cluster.$schema"
  def tableKey(db: String, cluster: String, schema: String, table: String): String =
    s"$db://$cluster.$schema/$table"
  def columnKey(tableKey: String, column: String): String = s"$tableKey/$column"
  def descriptionKey(ownerKey: String): String = s"$ownerKey/_description"
}
