package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.SqsPublisher

/** Streaming → queue integration: publish each micro-batch of a
  * streaming frame through the chunked SQS publisher (SURVEY §2.A S6
  * meets §2.B X10 — the continuous version of the reference's
  * cron-driven re-publish).
  *
  * foreachBatch gives at-least-once delivery per micro-batch (exactly
  * the reference's semantics: each cron tick republished the world);
  * the chunked publisher keeps executors in the data path and the
  * driver out of it.
  */
object StreamPublish {

  def start(stream: DataFrame, transport: SqsPublisher.Transport,
            queueUrl: String, checkpointDir: String,
            maxBytes: Int = SqsPublisher.MaxMessageBytes,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SqsPublisher.publishChunked(
          batch, batch.sparkSession.emptyDataFrame,
          transport, queueUrl, maxBytes = maxBytes)
        ()
      }
      .start()
}
