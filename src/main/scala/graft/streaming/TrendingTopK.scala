package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming trending-top-k: running per-key counts maintained by the
  * streaming aggregation state, with the current k leaders published
  * per trigger — the "trending domains / event types right now" report
  * a live ingest dashboard reads.
  *
  * Shape: a complete-mode streaming count (state = one row per key —
  * the BOUNDED-cardinality trending case: event types, domains,
  * languages; unbounded keys belong in the watermarked windowed form)
  * feeding `foreachBatch`, where the bounded-buffer
  * [[graft.functions.TopK]] aggregate reduces the full count table to
  * k rows (map-side heaps, so even a wide count table never shuffles
  * more than k rows per partition) and publishes them as a
  * replaceable temp view. Only k rows ever reach the driver.
  */
object TrendingTopK {

  def start(events: DataFrame, keyCol: String, k: Int,
            trendingView: String): StreamingQuery = {
    val spark = events.sparkSession
    events.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // the micro-batch runs on a CLONED session: register the TopK
        // function there (where the batch plan is analyzed), publish
        // the view on the ORIGINAL session (where readers look)
        val top = batch
          .agg(graft.functions.TopK.topK(batch.sparkSession,
            struct(col("cnt"), col(keyCol)), k).as("top"))
          .select(posexplode(col("top")).as(Seq("__r", "__c")))
          .select((col("__r") + 1).as("rank"),
            col(s"__c.$keyCol").as(keyCol), col("__c.cnt").as("cnt"))
        // k rows — materialize and swap the published view atomically
        spark.createDataFrame(
          java.util.Arrays.asList(top.collect(): _*), top.schema)
          .createOrReplaceTempView(trendingView)
        ()
      }
      .start()
  }
}
