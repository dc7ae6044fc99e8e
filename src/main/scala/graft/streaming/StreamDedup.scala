package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming near-duplicate filter — the continuous form of the
  * daily-ingest dedup loop (§2.B X14 meets X16): each micro-batch
  * band-joins the PERSISTED minhash signature index, survivors are
  * appended to the clean output, and the survivors' signatures are
  * appended to the index so every later batch dedups against everything
  * accepted before it. History text is never rescanned — per-batch cost
  * is shingling the batch plus one keyed join against the index, the
  * property that makes the loop viable when "history" is 100 TB.
  *
  * The index lives as an appendable parquet directory here; at scale
  * the same loop writes a bucketed/transactional table (band-key
  * bucketing turns the join into the co-located probe the batch
  * operator documents). foreachBatch is the right tool, not stateful
  * operators: the dedup state is a TABLE (queryable, compactable,
  * rebuildable), not per-key session state.
  *
  * Delivery semantics: AT-LEAST-ONCE per micro-batch — plain parquet
  * appends are not transactional, so a retried epoch can append the
  * same rows twice. Both outputs therefore carry the epoch's
  * `__batch_id` column: downstream readers (and an index compaction)
  * dedup on (batch id, doc id), which is exactly how the parquet sink
  * era handled retries before transactional tables; swap the two
  * writes for a transactional table commit to get exactly-once. The
  * clean output is written BEFORE the index so a crash between the
  * writes can only under-index (later dups of those rows get a second
  * look) — never silently drop accepted rows.
  *
  * Within-batch duplicates: survivors are additionally deduped against
  * each other ([[Dedup.minhashPairs]] inside the batch — batches are
  * bounded, history is not), keeping the min id like the batch path.
  */
object StreamDedup {

  /** Start the filter: `docs` is a streaming frame with (idCol,
    * textCol). Clean rows append to `outDir`; their signatures to
    * `indexDir`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            indexDir: String, outDir: String, checkpointDir: String,
            minJaccard: Double = 0.5,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(indexDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // glob for data files, not bare existence: a batch whose
        // survivors produced zero signatures leaves only _SUCCESS, and
        // schema inference over a fileless dir would kill the query
        val hasIndex = fs.exists(new Path(indexDir)) &&
          fs.globStatus(new Path(indexDir, "*.parquet")).nonEmpty

        // 1) drop batch rows near-duplicating the accepted history
        val vsHistory =
          if (!hasIndex) batch
          else {
            val dups = Dedup.incrementalNearDups(
              batch, idCol, textCol, spark.read.parquet(indexDir), minJaccard)
              .select(col("new_id").as(idCol)).distinct()
            batch.join(dups, Seq(idCol), "left_anti")
          }

        // 2) dedup survivors against EACH OTHER (bounded: one batch) —
        // same connected-components min-id survivor rule as the batch
        // pipeline
        val pairs = Dedup.minhashPairs(vsHistory, idCol, textCol, minJaccard)
        val clean = Dedup.dropNearDuplicates(vsHistory, idCol, pairs)
          .localCheckpoint(true) // both writes below consume it once

        // 3) append clean rows + their signatures (index grows by
        // batch); both stamped with the epoch for retry dedup
        clean.withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        Dedup.minhashSignatures(clean, idCol, textCol)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(indexDir)
        ()
      }
      .start()
}
