package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** SQS JSON publisher (SURVEY §2.A rows S6/A2/Z2) — the reference's
  * one novel component (/root/reference/publisher/
  * aws_sqs_csv_puiblisher.py:99-143): assemble all node rows then all
  * relation rows into one `{"nodes":[…],"relations":[…]}` JSON body
  * and send it as a single message with MessageGroupId "metadata"
  * (:53, :137), bounded by SQS's 250 KB limit (:63).
  *
  * Two modes:
  *  - **parity**: byte-compatible single envelope, assembled on the
  *    driver after a bounded collect — correct for metadata-sized
  *    results, guarded by the 250 KB check exactly like the reference.
  *  - **chunked** (the 100 TB path): executors build ≤maxBytes
  *    envelopes per partition and publish directly — no driver
  *    materialization (the reference's A2 anti-pattern), arbitrarily
  *    large graphs, one SQS client per partition.
  *
  * Transport is a trait so tests (and this zero-egress environment)
  * use an in-memory recorder; a production impl would wrap the AWS
  * SDK v2 SqsClient with the same three-argument send.
  */
object SqsPublisher {

  /** SQS hard cap per message (reference docstring :63). */
  val MaxMessageBytes: Int = 250 * 1024

  val DefaultGroupId = "metadata"

  trait Transport extends Serializable {
    def send(queueUrl: String, messageBody: String, messageGroupId: String): Unit

    /** FIFO send with an explicit `MessageDeduplicationId` (the SQS
      * server drops a second message with the same id inside the 5-min
      * dedup window — the exactly-once half of the streaming sink).
      * Default forwards to the 3-arg send so non-FIFO transports stay
      * one-method implementations; an AWS-SDK FIFO transport overrides
      * this to set the attribute on the request. */
    def send(queueUrl: String, messageBody: String, messageGroupId: String,
             dedupId: Option[String]): Unit =
      send(queueUrl, messageBody, messageGroupId)
  }

  /** In-memory transport for tests / dry runs. Messages land in a
    * JVM-global registry keyed by instance id: task closures are
    * serialized (copies!) even in local mode, so an instance field
    * would silently miss executor-side sends from publishChunked.
    * The id is public so string-option-configured writers (the DSv2
    * sink) can address the same buffer: `new Recording(sameId)`. */
  final class Recording(val id: String = java.util.UUID.randomUUID().toString) extends Transport {
    Recording.registry.putIfAbsent(id, new ArrayBuffer[(String, String, String, Option[String])])
    override def send(q: String, body: String, gid: String): Unit =
      send(q, body, gid, None)
    override def send(q: String, body: String, gid: String, dedupId: Option[String]): Unit = {
      val buf = Recording.registry.computeIfAbsent(id, _ => new ArrayBuffer)
      buf.synchronized { buf += ((q, body, gid, dedupId)) }
    }
    def sent: Seq[(String, String, String)] =
      sentDedup.map { case (q, b, g, _) => (q, b, g) }
    def sentDedup: Seq[(String, String, String, Option[String])] = {
      val buf = Recording.registry.computeIfAbsent(id, _ => new ArrayBuffer)
      buf.synchronized { buf.toSeq }
    }
    /** What a FIFO queue would actually DELIVER: first send wins per
      * (queue, dedupId); id-less sends always deliver. Test-side
      * emulation of the server's dedup window. */
    def delivered: Seq[(String, String, String)] = {
      val seen = scala.collection.mutable.Set.empty[(String, String)]
      sentDedup.flatMap {
        case (q, b, g, Some(d)) =>
          if (seen.add((q, d))) Some((q, b, g)) else None
        case (q, b, g, None) => Some((q, b, g))
      }
    }
  }
  object Recording {
    private val registry = new java.util.concurrent.ConcurrentHashMap[
      String, ArrayBuffer[(String, String, String, Option[String])]]
  }

  final case class MessageTooLarge(bytes: Int) extends RuntimeException(
    s"single-envelope parity mode: body is $bytes bytes > $MaxMessageBytes " +
      "(use publishChunked for large graphs)")

  final case class RowTooLarge(bytes: Int, maxBytes: Int) extends RuntimeException(
    s"a single row serializes to $bytes bytes — cannot fit any envelope ≤ $maxBytes; " +
      "oversized rows must be split or dropped upstream")

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** One row → JSON object, preserving the given column order (the
    * reference serializes csv-header order dicts). Null → JSON null,
    * empty string stays "". */
  def rowJson(columns: Seq[String], values: Seq[Any]): String =
    columns.zip(values).map { case (c, v) =>
      val vj = v match {
        case null => "null"
        case other => "\"" + jsonEscape(other.toString) + "\""
      }
      "\"" + jsonEscape(c) + "\": " + vj
    }.mkString("{", ", ", "}")

  def envelope(nodeJsons: Seq[String], relationJsons: Seq[String]): String =
    s"""{"nodes": [${nodeJsons.mkString(", ")}], "relations": [${relationJsons.mkString(", ")}]}"""

  /** Parity mode: single envelope, nodes first then relations
    * (reference :108-125 accumulation order), ≤250 KB enforced. */
  def publishParity(nodes: DataFrame, relations: DataFrame,
                    transport: Transport, queueUrl: String,
                    groupId: String = DefaultGroupId): String = {
    val nj = collectJson(nodes)
    val rj = collectJson(relations)
    val body = envelope(nj, rj)
    val bytes = body.getBytes("UTF-8").length
    if (bytes > MaxMessageBytes) throw MessageTooLarge(bytes)
    transport.send(queueUrl, body, groupId)
    body
  }

  private def collectJson(df: DataFrame): Seq[String] = {
    val cols = df.columns.toSeq
    df.collect().toSeq.map(r => rowJson(cols, r.toSeq))
  }

  /** Scale mode: per-partition chunked publish, no driver
    * materialization. Each executor accumulates rows into envelopes of
    * at most `maxBytes` and sends them as they fill. Nodes and
    * relations are published as separate streams of messages (the
    * single-envelope ordering guarantee is a parity-mode concept; at
    * scale consumers see many messages regardless). */
  def publishChunked(nodes: DataFrame, relations: DataFrame,
                     transport: Transport, queueUrl: String,
                     groupId: String = DefaultGroupId,
                     maxBytes: Int = MaxMessageBytes): Unit = {
    publishPartitioned(nodes, isNodes = true)
    publishPartitioned(relations, isNodes = false)

    def publishPartitioned(df: DataFrame, isNodes: Boolean): Unit = {
      val cols = df.columns.toSeq
      df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val buf = ArrayBuffer.empty[String]
        // sizes are UTF-8 BYTES, not UTF-16 chars — SQS caps bytes, and
        // CJK/emoji payloads are 3-4 bytes per char (round-1 advice)
        var size = 30 // envelope skeleton overhead (ASCII)
        def flush(): Unit = if (buf.nonEmpty) {
          val body =
            if (isNodes) envelope(buf.toSeq, Nil) else envelope(Nil, buf.toSeq)
          transport.send(queueUrl, body, groupId)
          buf.clear(); size = 30
        }
        rows.foreach { r =>
          val j = rowJson(cols, r.toSeq)
          val jb = j.getBytes("UTF-8").length
          // fail loudly on a row that can never fit, instead of sending
          // an envelope the queue would reject
          if (30 + jb > maxBytes) throw RowTooLarge(jb, maxBytes)
          if (size + jb + 2 > maxBytes) flush()
          buf += j
          size += jb + 2
        }
        flush()
      }
    }
  }
}
