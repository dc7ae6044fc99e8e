package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC corpus source/sink — the second columnar interchange format
  * (alongside parquet) that warehouse-adjacent corpora ship in. Spark's
  * native orc datasource gives the same scan behavior the engine relies
  * on for parquet: splittable stripes scan in parallel, predicate
  * pushdown + column pruning reach the reader, and hive-style
  * `partitionBy` directories support partition pruning — so every
  * scale property PlanSpec locks for parquet scans carries over.
  *
  * Write side: zlib is ORC's default; zstd keeps CPU/size balanced for
  * training-corpus rewrite-heavy pipelines and is splittable inside
  * stripes, so it is the default here.
  */
object OrcCorpus {

  /** Write a corpus as ORC, optionally hive-partitioned on low-
    * cardinality columns (e.g. lang, source — the partition-pruning
    * keys a curation pipeline filters on).
    *
    * Hive-layout caveat (Spark-standard, shared with the parquet
    * writer): a NULL or empty-string partition VALUE lands in the
    * `__HIVE_DEFAULT_PARTITION__` directory and reads back as NULL —
    * the layout cannot distinguish the two. Partition only on columns
    * where '' does not occur (or coalesce to a sentinel first);
    * non-partition data columns round-trip all values exactly. */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
            compression: String = "zstd"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Read an ORC corpus. Pass the schema explicitly where known —
    * same no-inference-pass rule as [[JsonlCorpus.read]]; ORC carries
    * its schema in the footer so inference is cheap, but pinning it
    * keeps reads stable across heterogeneous file generations. */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }
}
