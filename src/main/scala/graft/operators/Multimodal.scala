package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.B X25): image/audio/video
  * payloads ride as opaque BinaryType columns next to a typed metadata
  * struct; decode/feature-extraction runs per-partition in batches.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `FakeDecoder` derives deterministic pseudo-metadata
  * from the bytes. Everything around it — schema contract, partition
  * batching, output shape — is the real distributed plumbing a codec
  * would drop into: replace `FakeDecoder.decode` with the real library
  * call and nothing else changes.
  *
  * Scale notes: decode is a narrow mapPartitions (no shuffle); binary
  * payloads never pass through a wide transform, and feature columns
  * are pruned independently of payload bytes at the parquet scan when
  * stored as separate columns.
  */
object Multimodal {

  /** Decoded-media metadata contract. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decoder — deterministic fake standing in for an image codec.
    * A real deployment replaces this object only. */
  object FakeDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (String, Int, Int, Long) = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      val fmt = if (n % 2 == 0) "png" else "jpeg"
      // fake dimensions derived from content length — stable, cheap
      val w = (n % 1024).toInt + 1
      val h = ((n / 7) % 768).toInt + 1
      (fmt, w, h, n)
    }
  }

  /** Attach media binary + metadata columns to a frame (here: bytes
    * synthesized from a text column, since the test tables carry no
    * real binaries — the schema/batching is what's under test). */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", to_binary(col(textCol), lit("utf-8")))

  /** Batched decode over partitions: the Scala analogue of a Pandas
    * UDF / mapInPandas — one decoder instantiation per partition,
    * rows processed in a tight loop, output schema appended.
    *
    * Stays a typed Dataset.mapPartitions (round-1 verdict: the earlier
    * `df.rdd` hop left the SQL engine entirely, forcing an
    * InternalRow→Row conversion of every column — including the binary
    * payload — outside Tungsten; the typed form keeps the exchange
    * inside the plan as Deserialize→MapPartitions→Serialize, so
    * upstream/downstream stages remain codegen'd and columnar). */
  def decodeMedia(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ mediaMetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx) match {
          case b: Array[Byte] => b
          case null => null
          case other => other.toString.getBytes("UTF-8")
        }
        val (fmt, w, h, n) = FakeDecoder.decode(bytes)
        Row.fromSeq(r.toSeq ++ Seq(fmt, w, h, n))
      }
    }.toDF()
  }

  /** Frame-sampling stub for video-like payloads: emit every k-th
    * chunk of the binary as a "frame" row (1→N explode shape). */
  def sampleFrames(df: DataFrame, binCol: String, chunkBytes: Int, everyK: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((length(col(binCol)) / chunkBytes).cast("int") - 1, lit(0)), lit(everyK))))
      .withColumn("frame",
        col(binCol).substr(col("frame_idx") * chunkBytes + 1, lit(chunkBytes)))
}
