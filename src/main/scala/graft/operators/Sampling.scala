package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines (SURVEY §2.B X18-adjacent): `df.sample` is rng-seeded per
  * partition, so its output changes with partitioning, cluster size,
  * and engine — useless for a reproducible train/test split at 100 TB.
  * Hash-bucket assignment is the scale-correct alternative: the split
  * of a row depends only on its id, so it is stable across runs,
  * engines, repartitions, and incremental re-ingestion (a re-ingested
  * document lands in the same split it was in last month).
  *
  * The bucket is the first hex nibble of md5(id) — 16 buckets, portable
  * to any engine with md5 (DuckDB's is identical), no custom hash
  * needed. Narrow, codegen'd, shuffle-free.
  */
object Sampling {

  /** 16-bucket id hash: first hex character of md5(id as string). */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1)

  /** "test" for ids whose bucket falls below `testBuckets` (of 16),
    * "train" otherwise — e.g. testBuckets = 2 → 1/8 test split.
    * Lexicographic compare is safe: md5 hex is lowercase and digits
    * sort below letters in ASCII. */
  def splitColumn(id: Column, testBuckets: Int = 2): Column = {
    require(testBuckets > 0 && testBuckets < 16, "testBuckets in 1..15")
    when(hashBucket(id) < lit(f"$testBuckets%x"), "test").otherwise("train")
  }

  /** Keep ~(buckets/16) of rows, deterministically by id. */
  def sampleByHash(df: DataFrame, idCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets < 16, "buckets in 1..15")
    df.filter(hashBucket(col(idCol)) < lit(f"$buckets%x"))
  }
}
