package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB cases Catalyst's defaults don't
  * cover (SURVEY §2.A J1/J2 scale notes, §4 partitioning row):
  * bucketed co-located joins (no shuffle at read time) and salted
  * joins for pathological key skew.
  */
object ScaleJoins {

  /** Write a frame as a bucketed table: co-locates future equi-joins /
    * aggregations on `bucketCols` — both sides bucketed the same way
    * join with ZERO exchange, the single biggest shuffle saver for
    * repeatedly-joined 100 TB fact tables. Uses the session catalog
    * (parquet bucketed files + bucket spec in the table metadata).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted inner equi-join for skewed keys: the skewed (large) side
    * gets a deterministic salt in [0, saltFactor) derived from its
    * whole row hash; the small-but-hot side is replicated across all
    * salt values. Row multiplicity is preserved exactly — the salt is
    * only a partitioning refinement, both sides join on
    * (key, salt). AQE's skew-join handles moderate skew on its own;
    * this is for the "one key is 30% of the table" case where even a
    * split shuffle block overwhelms a task.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range-partitioned write: totally orders output files by `cols` so
    * downstream range predicates prune whole files (min/max stats). */
  def writeRangePartitioned(df: DataFrame, path: String, partitions: Int,
                            cols: Seq[Column]): Unit =
    df.repartitionByRange(partitions, cols: _*)
      .write.mode("overwrite").parquet(path)
}
