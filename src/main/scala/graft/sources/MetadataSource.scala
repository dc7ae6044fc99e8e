package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC metadata extraction (SURVEY §2.A rows S1-S3, R1-R4, F1,
  * J1/J2): the SQL the reference's extractors run against
  * `information_schema`, rebuilt from the behavior configured at
  * /root/reference/job/sample_mysql_aws_sqs_job.py:34-53 (MySQL) and
  * sample_postgres_aws_sqs_job.py:35-54 (Postgres).
  *
  * The query is pushed down whole via `option("query", …)` so the
  * source database computes the join/filter/projection exactly as it
  * does for the reference (manual pushdown F1 → the `where` parameter
  * here). The result lands as a DataFrame in the columns_meta shape
  * that GraphExpansion.tableMetadata consumes.
  *
  * For parallel extraction of very large catalogs, pass a
  * `partitionColumn`-style options map — plumbed straight into the
  * JDBC source.
  */
object MetadataSource {

  /** MySQL information_schema query (J1 left join + R1 aliases + R2
    * lower() + R3 is_view CASE). `useCatalogAsCluster` mirrors
    * USE_CATALOG_AS_CLUSTER_NAME (R4). */
  def mysqlMetadataSql(whereClause: String, cluster: String,
                       useCatalogAsCluster: Boolean): String = {
    val clusterExpr = if (useCatalogAsCluster) "lower(c.table_catalog)" else s"'$cluster'"
    s"""SELECT lower(c.table_schema)  AS `database`,
       |       $clusterExpr           AS `cluster`,
       |       lower(c.table_schema)  AS schema_name,
       |       lower(c.table_name)    AS table_name,
       |       t.table_comment        AS table_description,
       |       CASE WHEN lower(t.table_type) = 'view' THEN 'true' ELSE 'false' END AS is_view,
       |       lower(c.column_name)   AS col_name,
       |       lower(c.column_type)   AS col_type,
       |       c.ordinal_position     AS col_sort_order,
       |       c.column_comment       AS col_description
       |FROM information_schema.COLUMNS c
       |LEFT JOIN information_schema.TABLES t
       |  ON c.TABLE_NAME = t.TABLE_NAME AND c.TABLE_SCHEMA = t.TABLE_SCHEMA
       |$whereClause""".stripMargin
  }

  /** Postgres variant (J2: inner + two description left joins on
    * pg_description, per the reference's postgres job). */
  def postgresMetadataSql(whereClause: String, cluster: String,
                          useCatalogAsCluster: Boolean): String = {
    val clusterExpr = if (useCatalogAsCluster) "lower(c.table_catalog)" else s"'$cluster'"
    s"""SELECT lower(c.table_catalog) AS database,
       |       $clusterExpr           AS cluster,
       |       lower(c.table_schema)  AS schema_name,
       |       lower(c.table_name)    AS table_name,
       |       pgtd.description       AS table_description,
       |       CASE WHEN lower(t.table_type) = 'view' THEN 'true' ELSE 'false' END AS is_view,
       |       lower(c.column_name)   AS col_name,
       |       lower(c.data_type)     AS col_type,
       |       c.ordinal_position     AS col_sort_order,
       |       pgcd.description       AS col_description
       |FROM information_schema.columns c
       |INNER JOIN pg_catalog.pg_statio_all_tables st
       |  ON c.table_schema = st.schemaname AND c.table_name = st.relname
       |LEFT JOIN information_schema.tables t
       |  ON c.table_schema = t.table_schema AND c.table_name = t.table_name
       |LEFT JOIN pg_catalog.pg_description pgcd
       |  ON pgcd.objoid = st.relid AND pgcd.objsubid = c.ordinal_position
       |LEFT JOIN pg_catalog.pg_description pgtd
       |  ON pgtd.objoid = st.relid AND pgtd.objsubid = 0
       |$whereClause""".stripMargin
  }

  /** Run a pushed-down metadata query over JDBC. */
  def jdbc(spark: SparkSession, url: String, query: String,
           options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", query)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Partitioned JDBC extraction — the reference's one genuinely
    * distributed boundary (the DB-side pull at reference
    * job/sample_mysql_aws_sqs_job.py:74): Spark splits
    * [lowerBound, upperBound] into `numPartitions` range predicates on
    * `partitionColumn` and issues one query per partition, so a huge
    * information_schema (millions of column rows) is read by N
    * executors instead of one connection. `dbtable` form (a table name
    * or a `(subquery) alias`) because Spark forbids partition options
    * with `option("query")`. Rows outside the bounds are still
    * returned — bounds only shape the stride — so result equality with
    * the single-query read is exact.
    */
  def jdbcPartitioned(spark: SparkSession, url: String, dbtable: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
        .option("partitionColumn", partitionColumn)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Generic CSV-directory scan (S4): every regular file in `dir`,
    * header row, unlimited field size (the reference raises the csv
    * field limit — Spark needs maxCharsPerColumn lifted instead). */
  def csvDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").option("maxCharsPerColumn", "-1").csv(dir)
}
