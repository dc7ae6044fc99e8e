package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY §2.B X17):
  * brute-force cosine top-k as the exact baseline, plus two scale
  * paths — LSH bucketing (random hyperplanes) and an IVF-style
  * partition by coarse centroid.
  *
  * Everything is built from higher-order functions (codegen'd, no UDF)
  * on ArrayType(FloatType) columns; the double summation inside one row
  * is sequential, making results engine-deterministic.
  */
object Similarity {

  /** Exact top-k neighbours of one query vector (broadcast the single
    * query row; one pass over the corpus, TakeOrderedAndProject — no
    * full sort, no shuffle of the corpus).
    * Ties are broken by id so output order is total.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, k: Int): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__qv")))
    corpus.crossJoin(q)
      .select(col(idCol),
        // decimal(10,4) rounds deterministically cross-engine; the final
        // DOUBLE cast avoids the driver's trailing-zero decimal-hash trap.
        CosineSimilarity.cosine(corpus.sparkSession, col(vecCol), col("__qv"))
          .cast("decimal(10,4)").cast("double").as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batched exact kNN join: the top-k corpus neighbours of EVERY
    * query row (the retrieval shape of embedding-dedup audits, eval-set
    * contamination checks, and RAG index validation — [[bruteForceTopK]]
    * answers one query, this answers a batch).
    *
    * Scale shape: the query set broadcasts (BroadcastNestedLoopJoin —
    * corpus×Q candidates exist only inside narrow codegen, never on
    * disk or a wire), and the per-query reduction is the bounded-buffer
    * [[graft.functions.TopK]] aggregate, so map-side combine caps the
    * one shuffle at k rows per (query, partition) — a
    * `collect_list`+slice formulation would shuffle every candidate.
    * Scores are decimal(10,4)-pinned like every cosine query, ties
    * break to the larger neighbour id (struct order), rank is dense
    * from 1.
    */
  /** The documented bound on the broadcast query set: at a typical
    * 256-dim float embedding plus id, 100k rows is ~110 MB on every
    * executor — comfortably inside Spark's broadcast machinery, an
    * order of magnitude under the 8 GB hard cap. Above it, use
    * [[knnJoinBatched]]: degrading to extra corpus passes beats dying
    * on an oversized broadcast.
    */
  val MaxBroadcastQueries: Long = 100000L

  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int): DataFrame = {
    val nQ = queries.count() // one cheap action on the SMALL side only
    require(nQ <= MaxBroadcastQueries,
      s"query set has $nQ rows > $MaxBroadcastQueries broadcast bound; " +
        "use knnJoinBatched, which slices the query set into " +
        "broadcast-sized batches")
    knnJoinUnchecked(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
  }

  /** kNN join for query sets too big to broadcast whole: slice the
    * query set into `batchRows`-sized batches by a deterministic hash
    * of the query id, run the broadcast kNN join per batch, union the
    * results. Each batch is one extra corpus pass — at scale, B cheap
    * scans with bounded broadcasts beat one scan with an unbounded
    * (8 GB-capped, every-executor-resident) broadcast. Row-identical
    * to [[knnJoin]]: batches partition the query set, and each query's
    * top-k depends only on its own candidates.
    */
  def knnJoinBatched(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int, batchRows: Long = MaxBroadcastQueries): DataFrame = {
    require(batchRows >= 1, "batchRows must be positive")
    val nQ = queries.count()
    val nBatches = math.max(1L, (nQ + batchRows - 1) / batchRows).toInt
    if (nBatches == 1) {
      knnJoinUnchecked(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
    } else {
      (0 until nBatches).map { b =>
        val slice = queries.filter(
          pmod(xxhash64(col(qIdCol)), lit(nBatches)) === lit(b))
        knnJoinUnchecked(corpus, idCol, vecCol, slice, qIdCol, qVecCol, k)
      }.reduce(_ unionAll _)
    }
  }

  private def knnJoinUnchecked(corpus: DataFrame, idCol: String, vecCol: String,
                               queries: DataFrame, qIdCol: String, qVecCol: String,
                               k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val q = broadcast(queries.select(col(qIdCol).as("__qid"), col(qVecCol).as("__qvec")))
    corpus.join(q)
      .select(col("__qid"),
        struct(
          CosineSimilarity.cosine(spark, col(vecCol), col("__qvec"))
            .cast("decimal(10,4)").cast("double").as("cos"),
          col(idCol).as("nid")).as("__cand"))
      .groupBy(col("__qid"))
      .agg(graft.functions.TopK.topK(spark, col("__cand"), k).as("__top"))
      .select(col("__qid"), posexplode(col("__top")).as(Seq("__r", "__c")))
      .select(col("__qid").as(qIdCol), (col("__r") + 1).as("rank"),
        col("__c.nid").as(idCol), col("__c.cos").as("cos"))
  }

  /** All-pairs near-neighbour candidates via random-hyperplane LSH:
    * vectors sharing a signature bucket are compared exactly. Recall is
    * tunable with `planes` (fewer planes → bigger buckets → higher
    * recall, more comparisons). Per-bucket join, never all-pairs.
    */
  def lshNearPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   minCosine: Double,
                   planes: Int = 12, seed: Long = 42L): DataFrame = {
    // persist: both self-join branches read the signature frame (Spark
    // shares no subplans across branches — without it the scan and the
    // per-row signatures compute twice, the dominant cost at scale);
    // the small verified-pairs output is materialized so the cache is
    // released before returning (the dedup-family pattern)
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(corpus.sparkSession, col(vecCol), planes, seed).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = sig.select(col("bucket"), col("id").as("ida"), col("v").as("va"))
      .join(sig.select(col("bucket"), col("id").as("idb"), col("v").as("vb")), Seq("bucket"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        CosineSimilarity.cosine(corpus.sparkSession, col("va"), col("vb"))
          .cast("decimal(10,4)").cast("double").as("cos"))
      .filter(col("cos") >= minCosine)
    val materialized = out.localCheckpoint(true)
    sig.unpersist()
    materialized
  }

  /** IVF-style search: assign every corpus vector to its nearest of
    * `centroids` (a small broadcast table of (centroid_id, vec)), then
    * probe only the `nprobe` centroids closest to the query. At 100 TB
    * the corpus is pre-partitioned/bucketed by centroid_id so a probe
    * touches only matching partitions.
    *
    * Assignment is NARROW (round-2 verdict): the centroid table rides
    * along as one broadcast array-of-structs row and the per-row argmax
    * runs inside whole-stage codegen ([[graft.functions.NearestCentroid]]).
    * The earlier `groupBy(id, vec).agg(max_by(...))` formulation
    * expressed the same per-row computation as an aggregation, whose
    * final exchange shuffled every embedding across the network —
    * the whole corpus moved for a map-shaped step. Now the corpus never
    * shuffles: scan → argmax project → broadcast probe join → top-k.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
              query: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cb = broadcast(centroids.select(
      col(centroidIdCol).cast("long").as("__cid"), col(centroidVecCol).as("__cv")))
    // one-row centroid array, sorted by cid so argmax ties are
    // engine-independent (struct sort orders by the first field)
    val centArr = broadcast(
      cb.agg(array_sort(collect_list(struct(col("__cid"), col("__cv")))).as("__cents")))
    // nearest centroid per corpus vector: zero-exchange codegen argmax
    val assigned = corpus.crossJoin(centArr)
      .withColumn("__cid",
        graft.functions.NearestCentroid.nearest(corpus.sparkSession, col(vecCol), col("__cents")))
      .drop("__cents")
    // centroids to probe for this query
    val probed = query.select(col(vecCol).as("__qv")).crossJoin(cb)
      .select(col("__qv"), col("__cid"),
        CosineSimilarity.cosine(corpus.sparkSession, col("__qv"), col("__cv")).as("__ccos"))
      .orderBy(col("__ccos").desc).limit(nprobe)
      .select(col("__qv"), col("__cid"))
    assigned.join(broadcast(probed), Seq("__cid"))
      .select(col(idCol),
        CosineSimilarity.cosine(corpus.sparkSession, col(vecCol), col("__qv"))
          .cast("decimal(10,4)").cast("double").as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Top-k per group without a global sort: rank inside each group
    * partition and keep rank ≤ k (SURVEY §2.B X6 as a reusable op). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
