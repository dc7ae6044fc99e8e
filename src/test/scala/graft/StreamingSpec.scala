package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming semantics via MemoryStream (SURVEY §5.4 /
  * FIXTURES.md §4): tumbling windows, late-data drop past the
  * watermark, session non-merge at >gap, watermark-bounded dedup. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def ev(id: Long, minute: Int, typ: String = "a", user: Long = 1L): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, typ, 1.0)

  private def run(name: String, df: org.apache.spark.sql.DataFrame): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()

  test("tumbling window finalizes once the watermark passes; late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = run("tumbling_out", EventStreams.tumblingCounts(in.toDF(), "10 minutes"))
    try {
      in.addData(ev(1, 5), ev(2, 15), ev(3, 65, "b"))
      q.processAllAvailable()
      // watermark far past hour 0 and 1 → both windows finalize
      in.addData(ev(4, 300, "c"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select("event_type", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
      // a row 5 hours late for hour 0 must be dropped, not re-emitted
      in.addData(ev(5, 7))
      q.processAllAvailable()
      val after = spark.table("tumbling_out")
        .select("event_type", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("tumbling counts run on the RocksDB state store (scale-grade state backend)") {
    // at 100 TB / unbounded streams, keyed state outlives executor heap
    // — RocksDB is the provider that spills it to local disk. This pins
    // the engine's streaming operators to that backend (same results as
    // the default HDFS-backed in-memory provider).
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val q = run("rocksdb_out", EventStreams.tumblingCounts(in.toDF(), "10 minutes"))
    try {
      in.addData(ev(1, 5), ev(2, 7), ev(3, 65, "b"))
      q.processAllAvailable()
      in.addData(ev(4, 300, "c")) // advance watermark → finalize hours 0 and 1
      q.processAllAvailable()
      val rows = spark.table("rocksdb_out")
        .select("event_type", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("session windows: 31-minute gap splits, 29-minute gap merges") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = run("session_out", EventStreams.sessionCounts(in.toDF(), "30 minutes", "10 minutes"))
    try {
      // user 1: events 31 min apart → two sessions; user 2: 29 min → one
      in.addData(ev(1, 10, user = 1), ev(2, 41, user = 1),
        ev(3, 10, user = 2), ev(4, 39, user = 2))
      q.processAllAvailable()
      in.addData(ev(9, 600, user = 9)) // advance watermark to flush state
      q.processAllAvailable()
      val sessions = spark.table("session_out")
        .select("user_id", "n_events").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
      assert(sessions(1L) == Seq(1L, 1L))
      assert(sessions(2L) == Seq(2L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses repeats of event_id") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = run("dedup_out", EventStreams.dedupEvents(in.toDF(), "10 minutes"))
    try {
      in.addData(ev(1, 5), ev(1, 6), ev(2, 7))
      q.processAllAvailable()
      in.addData(ev(1, 8)) // duplicate within watermark → suppressed
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-static join enriches events with customer attributes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val customers = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select($"c_custkey", $"c_mktsegment")
    val q = graft.streaming.EventStreams
      .enriched(in.toDF(), customers, "user_id", "c_custkey")
      .writeStream.format("memory").queryName("enriched_out").outputMode("append").start()
    try {
      in.addData(ev(1, 5, user = 1), ev(2, 6, user = 999999))
      q.processAllAvailable()
      val rows = spark.table("enriched_out")
        .select("event_id", "c_mktsegment").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows(1L).nonEmpty)   // known customer → enriched
      assert(rows(2L).isEmpty)    // unknown user → left-join null
    } finally q.stop()
  }

  test("streaming CDC upsert: foreachBatch maintains a snapshot across micro-batches") {
    import graft.operators.MergeUpsert
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Long)]
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // versioned snapshot dirs: each batch reads the current version and
    // writes the next (never overwrites what it is reading)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$base/v0")
    @volatile var current = s"$base/v0"
    val q = in.toDF().toDF("k", "v", "op", "seq").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val next = s"$base/v${id + 1}"
        MergeUpsert.applyCdc(spark.read.parquet(current), batch, Seq("k"))
          .write.parquet(next)
        current = next
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString)
      .start()
    try {
      in.addData((3L, "c", "I", 1L), (2L, "b2", "U", 1L))
      q.processAllAvailable()
      in.addData((1L, "x", "D", 1L), (3L, "c2", "U", 2L))
      q.processAllAvailable()
      val snap = spark.read.parquet(current).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(snap == Seq((2L, "b2"), (3L, "c2")))
    } finally q.stop()
  }

  test("foreachBatch publishes each micro-batch through the chunked publisher") {
    import graft.sources.SqsPublisher
    import graft.streaming.StreamPublish
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val transport = new SqsPublisher.Recording
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    in.addData(ev(1, 5), ev(2, 15))
    val q = StreamPublish.start(
      in.toDF().select($"event_id", $"event_type"),
      transport, "q://stream", ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q.awaitTermination(60000)
      val bodies = transport.sent.map(_._2)
      assert(bodies.nonEmpty)
      assert(bodies.map(b => "\"event_id\"".r.findAllIn(b).size).sum == 2)
    } finally q.stop()
  }

  test("writeStream.format(\"graft-sqs\") chunk-publishes each epoch (DSv2 streaming write)") {
    import graft.sources.SqsPublisher
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val rec = new SqsPublisher.Recording
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_v2").toString
    in.addData(ev(1, 5), ev(2, 15), ev(3, 25))
    val q = in.toDF().select($"event_id".cast("string").as("KEY"), $"event_type".as("LABEL"))
      .writeStream.format("graft-sqs")
      .option("queue_url", "q://stream-v2")
      .option("transport", s"recording:${rec.id}")
      .option("kind", "nodes")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val bodies = rec.sent
      assert(bodies.nonEmpty)
      assert(bodies.forall { case (u, b, g) =>
        u == "q://stream-v2" && g == "metadata" && b.startsWith("""{"nodes": [""")
      })
      assert(bodies.map(b => "\"KEY\"".r.findAllIn(b._2).size).sum == 3)
    } finally q.stop()
  }

  test("graft-sqs fifo_dedup: a replayed epoch re-sends, but the FIFO dedup window delivers once") {
    // exactly-once option (round-7 verdict item 6): with
    // option("fifo_dedup", "true") every envelope carries a
    // content-derived MessageDeduplicationId. Simulate an epoch replay
    // by running the SAME data through a SECOND query from a fresh
    // checkpoint (epoch ids restart at 0 → same ids, same envelopes):
    // the transport stub records BOTH rounds of sends, but its
    // FIFO-window emulation (`delivered`) holds each envelope once.
    import graft.sources.SqsPublisher
    implicit val sqlCtx = spark.sqlContext
    val rec = new SqsPublisher.Recording
    def runOnce(): Unit = {
      val in = MemoryStream[Ev]
      in.addData(ev(1, 5), ev(2, 15), ev(3, 25))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_dedup").toString
      val q = in.toDF().select($"event_id".cast("string").as("KEY"), $"event_type".as("LABEL"))
        .writeStream.format("graft-sqs")
        .option("queue_url", "q://fifo-dedup")
        .option("transport", s"recording:${rec.id}")
        .option("kind", "nodes")
        .option("fifo_dedup", "true")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    runOnce()
    val firstRound = rec.sentDedup
    assert(firstRound.nonEmpty && firstRound.forall(_._4.isDefined),
      "fifo_dedup sends must carry a MessageDeduplicationId")
    assert(firstRound.forall(_._4.get.matches("[0-9a-f]{64}")),
      "dedup id must fit SQS's 128-char attribute (sha-256 hex)")
    runOnce() // the replay
    val all = rec.sentDedup
    assert(all.size == 2 * firstRound.size, "replay must have re-sent every envelope")
    // replayed envelopes carry the SAME ids → the server would drop them
    assert(all.map(_._4.get).distinct.size == firstRound.size)
    assert(rec.delivered.size == firstRound.size,
      s"FIFO window must deliver each envelope once, got ${rec.delivered.size}")
    // and the delivered payload is intact: all 3 KEYs exactly once
    assert(rec.delivered.map(b => "\"KEY\"".r.findAllIn(b._2).size).sum == 3)
  }

  test("checkpoint recovery: a restarted query resumes state, no duplicate or lost windows") {
    // the durability contract a long-running 100 TB stream depends on:
    // kill the query, start a NEW one from the same checkpoint, and the
    // file sink holds each finalized window EXACTLY once — committed
    // offsets are not replayed, pending state is not lost.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_rec").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_rec_out").toString
    def start(): StreamingQuery =
      EventStreams.tumblingCounts(in.toDF(), "10 minutes")
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      in.addData(ev(1, 5), ev(2, 6))        // window [0,10) type a, cnt 2
      q1.processAllAvailable()
      in.addData(ev(3, 65, "b"))            // advances watermark → [0,10) finalizes
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()                         // recover from the checkpoint
    try {
      in.addData(ev(4, 66, "b"))            // same window as ev(3): [60,70) b
      q2.processAllAvailable()
      in.addData(ev(5, 300, "c"))           // advances watermark → [60,70) finalizes
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .select("event_type", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // exactly one row per finalized window — the pre-restart window was
    // not re-emitted, and state for [60,70) survived the restart so
    // ev(3) (pre-restart) and ev(4) (post-restart) count together
    assert(rows.sorted.toSeq == Seq("a" -> 2L, "b" -> 2L), rows.mkString(","))
  }

  test("stream-stream interval join: right event within the interval joins, outside drops") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.intervalJoin(
      views.toDF().select($"user_id".as("v_user"), $"ts".as("v_ts"), $"event_id".as("v_id")),
      clicks.toDF().select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id")),
      "v_user", "c_user", "v_ts", "c_ts", interval = "10 minutes", watermark = "10 minutes")
    val q = run("ivj_out", joined.select("v_id", "c_id"))
    try {
      // view at min 0; click at min 5 (joins), click at min 25 (outside interval)
      views.addData(ev(1, 0, user = 7))
      clicks.addData(ev(100, 5, user = 7), ev(101, 25, user = 7))
      // advance both watermarks far past the interval so results finalize
      views.addData(ev(2, 120, user = 8))
      clicks.addData(ev(102, 120, user = 9))
      q.processAllAvailable()
      val rows = spark.table("ivj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 100L)), rows.toString)
    } finally q.stop()
  }

  test("left-outer interval join: unmatched view emits with nulls after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.intervalJoin(
      views.toDF().select($"user_id".as("v_user"), $"ts".as("v_ts"), $"event_id".as("v_id")),
      clicks.toDF().select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id")),
      "v_user", "c_user", "v_ts", "c_ts", interval = "10 minutes",
      watermark = "10 minutes", joinType = "left_outer")
    val q = run("ivjo_out", joined.select("v_id", "c_id"))
    try {
      views.addData(ev(1, 0, user = 7), ev(2, 0, user = 8))
      clicks.addData(ev(100, 5, user = 7)) // user 7 converts; user 8 never does
      q.processAllAvailable()
      // push both watermarks far past view-time + interval so the
      // unmatched row finalizes (outer results wait for the watermark)
      views.addData(ev(3, 240, user = 1))
      clicks.addData(ev(101, 240, user = 1))
      q.processAllAvailable()
      views.addData(ev(4, 300, user = 1))
      clicks.addData(ev(102, 300, user = 1))
      q.processAllAvailable()
      val rows = spark.table("ivjo_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 100L)), rows.toString)  // matched pair
      assert(rows.contains((2L, -1L)), rows.toString)   // null-completed after watermark
    } finally q.stop()
  }

  test("stateful sessionizer emits sessions as they close, state times out") {
    import graft.streaming.StatefulSessions
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulSessions.Event]
    def sev(id: Long, minute: Int, user: Long) = StatefulSessions.Event(
      id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, "a", 1.0)
    val withWm = in.toDS().withWatermark("ts", "10 minutes")
      .as[StatefulSessions.Event]
    val q = StatefulSessions.closedSessions(withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("stateful_out").outputMode("append").start()
    try {
      // user 1: burst at :10-:12, second burst at :50 (gap 38 min > 30)
      in.addData(sev(1, 10, 1), sev(2, 12, 1))
      q.processAllAvailable()
      in.addData(sev(3, 50, 1)) // closes session 1 in-stream
      q.processAllAvailable()
      in.addData(sev(9, 600, 9)) // watermark advance → times out session 2
      q.processAllAvailable()
      in.addData(sev(10, 660, 9)) // one more batch so the timeout fires
      q.processAllAvailable()
      val rows = spark.table("stateful_out")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(rows.contains((1L, 2)))  // first burst closed by the gap
      assert(rows.contains((1L, 1)))  // second burst closed by timeout
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState contract") {
    // Spark 4's arbitrary-state v2 (transformWithState: typed state
    // slots + explicit event-time timers) driven through the same
    // session scenario as the v1 operator above — same closed-session
    // rows must come out. Requires the RocksDB state store provider.
    import graft.streaming.{StatefulSessions, TwsSessions}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatefulSessions.Event]
    def sev(id: Long, minute: Int, user: Long) = StatefulSessions.Event(
      id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, "a", 1.0)
    val withWm = in.toDS().withWatermark("ts", "10 minutes")
      .as[StatefulSessions.Event]
    val q = TwsSessions.closedSessions(withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("tws_out").outputMode("append").start()
    try {
      in.addData(sev(1, 10, 1), sev(2, 12, 1)) // burst 1
      q.processAllAvailable()
      in.addData(sev(3, 50, 1)) // gap 38 min > 30 → closes burst 1 in-stream
      q.processAllAvailable()
      in.addData(sev(9, 600, 9)) // watermark advance → timer for burst 2 fires
      q.processAllAvailable()
      in.addData(sev(10, 660, 9)) // one more batch so the timer batch runs
      q.processAllAvailable()
      val rows = spark.table("tws_out")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(rows.contains((1L, 2)), rows.toString)  // burst 1: closed by gap
      assert(rows.contains((1L, 1)), rows.toString)  // burst 2: closed by timer
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState rolling quantiles: sketch state accumulates across batches") {
    // the KLL sketch as streaming state (TwsQuantiles): per-key
    // all-history quantile snapshots at O(k log n) state. k exceeds
    // the value counts here, so the no-compaction exact regime applies
    // and every snapshot is the exact ceil(p*n) order statistic of
    // everything the key has EVER sent — batch 2's snapshot proves the
    // RocksDB-serialized sketch survived the batch boundary.
    import graft.streaming.{StatefulSessions, TwsQuantiles}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatefulSessions.Event]
    def vev(id: Long, user: Long, v: Double) = StatefulSessions.Event(
      id, Timestamp.valueOf("2024-01-01 00:00:00"), user, "a", v)
    val q = TwsQuantiles.rollingQuantiles(
        in.toDS(), ps = Seq(0.5, 1.0), k = 1024)
      .writeStream.format("memory").queryName("tws_q_out")
      .outputMode("update").start()
    try {
      in.addData((1 to 10).map(i => vev(i, 1L, i.toDouble)) :+ vev(90, 2L, 100.0): _*)
      q.processAllAvailable()
      in.addData((11 to 20).map(i => vev(i, 1L, i.toDouble)): _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_q_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
        .toSeq
      // batch 1: user 1 over 1..10 → p50 = 5 (ceil(.5·10)), max = 10
      assert(snaps.contains((1L, 10L, Seq(5.0, 10.0))), snaps.toString)
      // batch 2: user 1 over 1..20 — history NOT forgotten → p50 = 10
      assert(snaps.contains((1L, 20L, Seq(10.0, 20.0))), snaps.toString)
      // user 2 got no batch-2 rows: exactly one snapshot, no re-emit
      assert(snaps.count(_._1 == 2L) == 1 &&
        snaps.contains((2L, 1L, Seq(100.0, 100.0))), snaps.toString)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState mSPRT monitor: final stream readout EQUALS the batch msprt") {
    // the streaming experiment monitor (TwsMsprt): per-metric exact
    // decimal moments as RocksDB value state, the batch operator's OWN
    // Λ/p chain (Stats.msprtChain) on every micro-batch. Decimal sums
    // are order-independent, so the final snapshot must equal
    // Stats.msprt on the union of all batches BIT-FOR-BIT — the
    // TwsHllDistinct batch-equality pattern for the experimentation
    // family. Early degenerate prefixes (an arm under 2 rows) stay
    // silent rather than emitting NaN.
    import graft.streaming.TwsMsprt
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsMsprt.MetricObs]
    // a planted +2.5 arm shift; m2 runs the same generator with fewer
    // rows and an unbalanced split (exercises the per-key isolation)
    def obs(metric: String, i: Int, armA: Boolean): TwsMsprt.MetricObs =
      TwsMsprt.MetricObs(metric,
        (i % 7).toDouble + (if (armA) 2.5 else 0.0), armA)
    val batch1 = (1 to 15).map(i => obs("m1", i, i % 2 == 0)) ++
      (1 to 6).map(i => obs("m2", i, i % 3 == 0))
    val batch2 = (16 to 40).map(i => obs("m1", i, i % 2 == 0)) ++
      (7 to 30).map(i => obs("m2", i, i % 3 == 0)) ++
      // non-finite values: the batch cast-to-decimal NULLs and filters
      // them; the stream must SKIP them (not crash on BigDecimal.valueOf
      // nor absorb them) so equality below still holds bit-for-bit
      Seq(TwsMsprt.MetricObs("m1", Double.PositiveInfinity, armA = true),
        TwsMsprt.MetricObs("m1", Double.NegativeInfinity, armA = false),
        TwsMsprt.MetricObs("m2", Double.NaN, armA = true))
    val q = TwsMsprt.monitor(in.toDS(), tau2 = 4.0, alpha = 0.05)
      .writeStream.format("memory").queryName("tws_msprt_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // memory sink in update mode appends all emissions; the FINAL
      // snapshot per metric is the one with the largest n_a + n_b
      val snaps = spark.table("tws_msprt_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7)))
      assert(snaps.count(_._1 == "m1") == 2,
        s"m1 must emit once per batch: $snaps")
      val fin = snaps.groupBy(_._1).map { case (m, ss) =>
        m -> ss.maxBy(s => s._2 + s._3)
      }
      // batch replay of the SAME rows through Stats.msprt
      val all = (batch1 ++ batch2).toDF("metric", "value", "armA")
      for (m <- Seq("m1", "m2")) {
        val b = graft.operators.Stats.msprt(
          all.filter(col("metric") === m), "value", col("armA"),
          tau2 = 4.0, alpha = 0.05).head()
        val s = fin(m)
        assert(s._2 == b.getLong(0) && s._3 == b.getLong(1), s"$m counts")
        assert(s._4 == b.getDouble(2), s"$m diff must be bit-equal")
        assert(s._5 == b.getDouble(3), s"$m v must be bit-equal")
        assert(s._6 == b.getDouble(4), s"$m lambda must be bit-equal")
        assert(s._7 == b.getDouble(5), s"$m p must be bit-equal")
        assert(s._8 == b.getBoolean(6), s"$m significance flag")
      }
      // the shifted metric should be the significant one
      assert(fin("m1")._8, "a +2.5 shift over 40 rows should reject")
      // off-grid values fail LOUD, not silently rounded
      in.addData(TwsMsprt.MetricObs("m3", 1.0000001, armA = true))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage != null)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState multi-arm monitor: stream readout EQUALS the batch multiArm") {
    // the k-arm face of the streaming monitoring tier (TwsMultiArm):
    // per-metric MapState arm → exact decimal moments, the batch
    // operator's OWN chain (Stats.multiArmChain — welchChain + the
    // shared bhThreshold) per micro-batch. Decimal sums are
    // order-independent, so the final per-arm snapshots must equal
    // Stats.multiArm on the union of all batches BIT-FOR-BIT. A
    // control-less or one-armed prefix stays SILENT (the chain's Left
    // states — what the batch fails loud on).
    import graft.streaming.TwsMultiArm
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsMultiArm.ArmObs]
    def obs(m: String, i: Int, arm: String, shift: Double) =
      TwsMultiArm.ArmObs(m, (i % 7).toDouble + shift, arm)
    // batch 1 for m1 has NO control rows yet → must stay silent;
    // m2 exercises per-key isolation with a different arm set
    val batch1 = (1 to 8).map(i => obs("m1", i, "far", 25.0)) ++
      (1 to 6).map(i => obs("m1", i, "near", 0.5)) ++
      (1 to 10).map(i => obs("m2", i, "ctrl", 0.0))
    val batch2 = (1 to 20).map(i => obs("m1", i, "ctrl", 0.0)) ++
      (9 to 20).map(i => obs("m1", i, "far", 25.0)) ++
      (1 to 12).map(i => obs("m2", i, "t1", 1.0)) ++
      // non-finite values skip (the batch finite() gate's streaming face)
      Seq(TwsMultiArm.ArmObs("m1", Double.PositiveInfinity, "far"),
        TwsMultiArm.ArmObs("m2", Double.NaN, "ctrl"))
    val q = TwsMultiArm.monitor(in.toDS(), controlArm = "ctrl", q = 0.05)
      .writeStream.format("memory").queryName("tws_multiarm_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      val early = spark.table("tws_multiarm_out").count()
      assert(early == 0L, "a control-less prefix must stay silent")
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_multiarm_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8), r.getDouble(9), r.getBoolean(10)))
      // final snapshot per (metric, arm) = largest pooled count
      val fin = snaps.groupBy(s => (s._1, s._2)).map { case (k, ss) =>
        k -> ss.maxBy(s => s._3 + s._4)
      }
      assert(fin.keySet == Set(("m1", "far"), ("m1", "near"), ("m2", "t1")))
      // batch replay of the SAME rows through Stats.multiArm
      val all = (batch1 ++ batch2).toDF("metric", "value", "arm")
      for (m <- Seq("m1", "m2")) {
        val b = graft.operators.Stats.multiArm(
          all.filter(col("metric") === m), "value", "arm",
          controlArm = "ctrl", q = 0.05).collect()
        b.foreach { r =>
          val s = fin((m, r.getString(0)))
          assert(s._3 == r.getLong(1) && s._4 == r.getLong(2), s"$m counts")
          assert(s._5 == r.getDouble(3) && s._6 == r.getDouble(4),
            s"$m means must be bit-equal")
          assert(s._7 == r.getDouble(5), s"$m diff must be bit-equal")
          assert(s._8 == r.getDouble(6) && s._9 == r.getDouble(7),
            s"$m t/df must be bit-equal")
          assert(s._10 == r.getDouble(8), s"$m p must be bit-equal")
          assert(s._11 == r.getBoolean(9), s"$m significance flag")
        }
      }
      // the planted +25 arm rejects, the +0.5 arm does not
      assert(fin(("m1", "far"))._11 && !fin(("m1", "near"))._11)
      // off-grid values fail LOUD, not silently rounded
      in.addData(TwsMultiArm.ArmObs("m3", 1.0000001, "ctrl"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage != null)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState group-sequential monitor: populated-prefix readout EQUALS the batch groupSequential") {
    // the scheduled-looks member of the streaming monitoring tier
    // (TwsGroupSeq): per-metric MapState look → exact decimal arm
    // moments, the batch operator's OWN chain (Stats.groupSeqChain)
    // folded over the POPULATED look prefix with the REQUIRED planned
    // total. Decimal sums are order-independent, so each emission must
    // equal Stats.groupSequential on the same rows with the schedule
    // truncated to the populated looks and the same plannedTotal —
    // BIT-FOR-BIT. A thin first look stays silent.
    import graft.streaming.TwsGroupSeq
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsGroupSeq.LookObs]
    val planned = 120L
    def obs(i: Int, look: Int, armA: Boolean) = TwsGroupSeq.LookObs(
      "m1", look, (i % 7).toDouble + (if (armA) 2.0 else 0.0), armA)
    // batch 1 fills look 1 only; batch 2 fills looks 2 and 3 (+ a
    // non-finite row the monitor must skip)
    val batch1 = (1 to 20).map(i => obs(i, 1, i % 2 == 0))
    val batch2 = (21 to 50).map(i => obs(i, 2, i % 2 == 0)) ++
      (51 to 80).map(i => obs(i, 3, i % 2 == 0)) :+
      TwsGroupSeq.LookObs("m1", 2, Double.NaN, armA = true)
    val q = TwsGroupSeq.monitor(in.toDS(), k = 4, plannedTotal = planned)
      .writeStream.format("memory").queryName("tws_groupseq_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_groupseq_out").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getBoolean(7),
          if (r.isNullAt(8)) None else Some(r.getInt(8))))
      // batch 1 emitted the 1-look prefix; batch 2 the 3-look prefix
      assert(snaps.length == 1 + 3, snaps.mkString("\n"))
      // the full emission MULTISET equals the two truncated batch
      // replays (the update-mode trace IS two prefix reads): the
      // 1-look read over batch 1, then the 3-look read over the union
      def replay(rows: Seq[TwsGroupSeq.LookObs], looks: Int) =
        graft.operators.Stats.groupSequential(
            rows.map(o => (o.look, o.value, o.armA)).toDF("t", "v", "armA"),
            "v", col("armA"), "t",
            cutoffs = (1 to looks).map(org.apache.spark.sql.functions.lit(_)),
            plannedTotal = Some(planned))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6),
            if (r.isNullAt(7)) None else Some(r.getInt(7)))).toSeq
      val expected = replay(batch1, 1) ++ replay(batch1 ++ batch2, 3)
      assert(snaps.toSeq.sortBy(s => (s._2 + s._3, s._1)) ==
        expected.sortBy(s => (s._2 + s._3, s._1)),
        s"stream ${snaps.toSeq}\nbatch $expected")
      // a thin prefix stays silent: new metric, one row per arm
      in.addData(TwsGroupSeq.LookObs("m2", 1, 1.0, armA = true),
        TwsGroupSeq.LookObs("m2", 1, 2.0, armA = false))
      q.processAllAvailable()
      assert(!spark.table("tws_groupseq_out").collect()
        .exists(_.getString(0) == "m2"), "thin prefix must emit nothing")
      // an out-of-schedule look id fails LOUD (routing bug)
      in.addData(TwsGroupSeq.LookObs("m1", 9, 1.0, armA = true))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage != null)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState per-segment effects: stream readout EQUALS the batch welchTByGroup") {
    // the slicing member of the streaming experimentation tier
    // (TwsWelchSegments): per-metric MapState segment → exact decimal
    // arm moments, the batch operator's OWN chain
    // (Stats.welchSegmentsChain — welchChain per segment + the shared
    // bhThreshold) per micro-batch. Decimal sums are
    // order-independent, so the final per-segment snapshots must equal
    // Stats.welchTByGroup on the union of all batches BIT-FOR-BIT. A
    // prefix with a one-armed segment stays SILENT (the batch fails
    // loud on the same state).
    import graft.streaming.TwsWelchSegments
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsWelchSegments.SegObs]
    def obs(seg: String, i: Int, armA: Boolean, shift: Double) =
      TwsWelchSegments.SegObs("m1", seg,
        (i % 7).toDouble + (if (armA) shift else 0.0), armA)
    // batch 1: segment sx has only arm A → the whole metric stays
    // silent (batch welchTByGroup would fail loud on the same prefix)
    val batch1 = (1 to 10).map(i => obs("sx", i, armA = true, 20.0)) ++
      (1 to 12).map(i => obs("sy", i, i % 2 == 0, 0.5))
    val batch2 = (1 to 10).map(i => obs("sx", i, armA = false, 20.0)) ++
      (13 to 30).map(i => obs("sy", i, i % 2 == 0, 0.5)) :+
      TwsWelchSegments.SegObs("m1", "sx", Double.NaN, armA = true)
    val q = TwsWelchSegments.monitor(in.toDS(), q = 0.05)
      .writeStream.format("memory").queryName("tws_welchseg_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      assert(spark.table("tws_welchseg_out").count() == 0L,
        "a one-armed segment must keep the metric silent")
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_welchseg_out").collect()
        .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9), r.getBoolean(10))).toMap
      assert(snaps.keySet == Set("sx", "sy"))
      // batch replay of the SAME rows through Stats.welchTByGroup
      val all = (batch1 ++ batch2)
        .map(o => (o.segment, o.value, o.armA)).toDF("seg", "v", "armA")
      val b = graft.operators.Stats.welchTByGroup(all, "v", "seg",
          col("armA"), q = 0.05).collect()
      b.foreach { r =>
        val s = snaps(r.getString(0))
        assert(s._1 == r.getLong(1) && s._2 == r.getLong(2),
          s"${r.getString(0)} counts")
        assert(s._3 == r.getDouble(3) && s._4 == r.getDouble(4),
          s"${r.getString(0)} means must be bit-equal")
        assert(s._5 == r.getDouble(5) && s._6 == r.getDouble(6) &&
          s._7 == r.getDouble(7), s"${r.getString(0)} diff/t/df")
        assert(s._8 == r.getDouble(8) && s._9 == r.getBoolean(9),
          s"${r.getString(0)} p/significance")
      }
      // the planted +20 segment rejects, the +0.5 one does not
      assert(snaps("sx")._9 && !snaps("sy")._9)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState per-segment quantile effects: stream readout EQUALS the batch operator") {
    // the quantile face of the streaming slicing tier
    // (TwsQuantileSegments, r17 verdict item 4): per-metric MapState
    // (segment, resample, arm) → weighted KLL sketch, the batch
    // operator's OWN chain (Stats.quantileSegmentsChain) per
    // micro-batch. Weighted binary-decomposition inserts commute and
    // the test stays in the exact-sketch regime, so the final
    // snapshots must equal Stats.bootstrapQuantileDiffBySegment on the
    // union of all batches BIT-FOR-BIT. A prefix with a one-armed
    // segment stays SILENT (the batch fails loud on the same state).
    import graft.streaming.TwsQuantileSegments
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsQuantileSegments.QSegObs]
    // sx: +30 planted shift on arm A; sy: PAIRED values (each key pair
    // shares v across arms) so its true quantile diff is 0
    def sx(i: Int, armA: Boolean) = TwsQuantileSegments.QSegObs("m1", "sx",
      (if (armA) 1000L else 2000L) + i,
      (i % 7).toDouble + (if (armA) 30.0 else 0.0), armA)
    def sy(j: Int) = Seq(
      TwsQuantileSegments.QSegObs("m1", "sy", 3000L + 2L * j, (j % 7).toDouble, armA = true),
      TwsQuantileSegments.QSegObs("m1", "sy", 3001L + 2L * j, (j % 7).toDouble, armA = false))
    // batch 1: sx has only arm A → the whole metric stays silent
    val batch1 = (1 to 10).map(sx(_, armA = true)) ++ (1 to 8).flatMap(sy)
    val batch2 = (1 to 10).map(sx(_, armA = false)) ++ (9 to 20).flatMap(sy) :+
      TwsQuantileSegments.QSegObs("m1", "sx", 9999L, Double.NaN, armA = true)
    val q = TwsQuantileSegments.monitor(in.toDS(), ps = Seq(0.5, 0.9),
        b = 50, alpha = 0.05, q = 0.05, k = 65536)
      .writeStream.format("memory").queryName("tws_qseg_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      assert(spark.table("tws_qseg_out").count() == 0L,
        "a one-armed segment must keep the metric silent")
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_qseg_out").collect()
        .map(r => (r.getString(1), r.getDouble(2)) -> (r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9), r.getBoolean(10))).toMap
      assert(snaps.keySet ==
        Set(("sx", 0.5), ("sx", 0.9), ("sy", 0.5), ("sy", 0.9)))
      // batch replay of the SAME rows through the batch operator
      val all = (batch1 ++ batch2)
        .map(o => (o.key, o.segment, o.value, o.armA))
        .toDF("k", "seg", "v", "armA")
      val b = graft.operators.Stats.bootstrapQuantileDiffBySegment(all,
          "v", "k", "seg", col("armA"), ps = Seq(0.5, 0.9), b = 50,
          alpha = 0.05, k = 65536, q = 0.05).collect()
      assert(b.length == 4)
      b.foreach { r =>
        val s = snaps((r.getString(0), r.getDouble(1)))
        assert(s._1 == r.getLong(2) && s._2 == r.getLong(3) &&
          s._3 == r.getLong(4), s"${r.getString(0)} counts")
        assert(s._4 == r.getDouble(5) && s._5 == r.getDouble(6) &&
          s._6 == r.getDouble(7),
          s"${r.getString(0)} diff/ci must be bit-equal")
        assert(s._7 == r.getDouble(8) && s._8 == r.getBoolean(9),
          s"${r.getString(0)} p_boot/significance")
      }
      // the planted +30 segment rejects at p50, the paired-null one
      // does not
      assert(snaps(("sx", 0.5))._8 && !snaps(("sy", 0.5))._8)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState CUPED snapshot: stream readout EQUALS the batch cuped") {
    // the covariate half of the streaming variance-reduction tier
    // (TwsCuped): per-metric value state = the 12 exact decimal cross
    // moments, the batch operator's OWN θ/ρ²/t chain (Stats.cupedChain)
    // per micro-batch — decimal sums are order-independent, so the
    // final snapshot must equal Stats.cuped on the union of all
    // batches BIT-FOR-BIT. A zero-pooled-covariate prefix stays
    // SILENT (the chain's Left state — what the batch fails loud on).
    import graft.streaming.TwsCuped
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsCuped.CovariateObs]
    // correlated covariate (x ≈ pre-period y) + a planted arm lift;
    // m2's batch-1 prefix has a CONSTANT covariate → silent until
    // batch 2 unfreezes it
    def obs(m: String, i: Int, armA: Boolean) = TwsCuped.CovariateObs(m,
      (i % 7).toDouble + (if (armA) 2.0 else 0.0), (i % 7).toDouble + 1.0,
      armA)
    val batch1 = (1 to 15).map(i => obs("m1", i, i % 2 == 0)) ++
      (1 to 6).map(i => TwsCuped.CovariateObs("m2",
        (i % 3).toDouble, 5.0, i % 2 == 0))
    val batch2 = (16 to 40).map(i => obs("m1", i, i % 2 == 0)) ++
      (7 to 20).map(i => TwsCuped.CovariateObs("m2",
        (i % 3).toDouble, (i % 4).toDouble, i % 2 == 0)) ++
      // a non-finite value in EITHER column drops the PAIR
      Seq(TwsCuped.CovariateObs("m1", Double.NaN, 1.0, armA = true),
        TwsCuped.CovariateObs("m1", 1.0, Double.PositiveInfinity, armA = false))
    val q = TwsCuped.monitor(in.toDS())
      .writeStream.format("memory").queryName("tws_cuped_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_cuped_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7)))
      // m2's constant-covariate prefix is silent: ONE emission; m1: two
      assert(snaps.count(_._1 == "m1") == 2, snaps.mkString(","))
      assert(snaps.count(_._1 == "m2") == 1, snaps.mkString(","))
      val all = (batch1 ++ batch2).toDF("metric", "y", "x", "armA")
      for (m <- Seq("m1", "m2")) {
        val b = graft.operators.Stats.cuped(
          all.filter(col("metric") === m), "y", "x", col("armA")).head()
        val s = snaps.filter(_._1 == m).maxBy(x => x._2 + x._3)
        assert(s._2 == b.getLong(0) && s._3 == b.getLong(1), s"$m counts")
        assert(s._4 == b.getDouble(2), s"$m theta must be bit-equal")
        assert(s._5 == b.getDouble(3), s"$m rho2 must be bit-equal")
        assert(s._6 == b.getDouble(4), s"$m diff_raw must be bit-equal")
        assert(s._7 == b.getDouble(5), s"$m diff_adj must be bit-equal")
        assert(s._8 == b.getDouble(6), s"$m t_adj must be bit-equal")
      }
      // off-grid covariate fails LOUD, not silently rounded
      in.addData(TwsCuped.CovariateObs("m9", 1.0, 1.0000001, armA = true))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage != null)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState post-stratified snapshot: stream readout EQUALS the batch postStratifiedDiff") {
    // the variance-reduction tier streamed (TwsPostStrat): per-metric
    // MAP state stratum → exact decimal arm moments, the batch
    // operator's OWN sorted-stratum fold (Stats.postStratChain) per
    // micro-batch. Decimal sums are order-independent and the fold
    // order is pinned inside the chain, so the final snapshot must
    // equal Stats.postStratifiedDiff on the union of all batches
    // BIT-FOR-BIT. Prefixes where the readout is undefined (a
    // one-armed stratum mid-fill) stay SILENT — exactly the states the
    // batch operator fails loud on.
    import graft.streaming.TwsPostStrat
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsPostStrat.StratumObs]
    // strata with different sizes and arm shares; a planted arm shift
    def obs(m: String, s: String, i: Int, armA: Boolean) =
      TwsPostStrat.StratumObs(m, s,
        (i % 5).toDouble + (if (armA) 1.5 else 0.0) +
          (if (s == "t") 10.0 else 0.0), armA)
    // batch 1 leaves stratum "t" one-armed for m1 → NO m1 emission yet
    val batch1 = (1 to 8).map(i => obs("m1", "s", i, i % 2 == 0)) ++
      (1 to 3).map(i => obs("m1", "t", i, armA = true)) ++
      (1 to 10).map(i => obs("m2", "s", i, i % 2 == 1))
    val batch2 = (9 to 30).map(i => obs("m1", "s", i, i % 2 == 0)) ++
      (4 to 16).map(i => obs("m1", "t", i, i % 3 == 0)) ++
      (11 to 40).map(i => obs("m2", "s", i, i % 2 == 1)) ++
      // non-finite values: skipped by the stream, finite-gated by batch
      Seq(TwsPostStrat.StratumObs("m1", "s", Double.NaN, armA = true),
        TwsPostStrat.StratumObs("m1", "t", Double.PositiveInfinity, armA = false))
    val q = TwsPostStrat.monitor(in.toDS())
      .writeStream.format("memory").queryName("tws_poststrat_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_poststrat_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      // m1's batch-1 prefix has a one-armed stratum: silent, ONE
      // emission total; m2 is defined at both batches: two emissions
      assert(snaps.count(_._1 == "m1") == 1, snaps.mkString(","))
      assert(snaps.count(_._1 == "m2") == 2, snaps.mkString(","))
      val all = (batch1 ++ batch2)
        .toDF("metric", "stratum", "value", "armA")
      for (m <- Seq("m1", "m2")) {
        val b = graft.operators.Stats.postStratifiedDiff(
          all.filter(col("metric") === m), "value", "stratum",
          col("armA")).head()
        val s = snaps.filter(_._1 == m).maxBy(x => x._2 + x._3)
        assert(s._2 == b.getLong(0) && s._3 == b.getLong(1), s"$m counts")
        assert(s._4 == b.getLong(2), s"$m n_strata")
        assert(s._5 == b.getDouble(3), s"$m diff_raw must be bit-equal")
        assert(s._6 == b.getDouble(4), s"$m diff_strat must be bit-equal")
        assert(s._7 == b.getDouble(5), s"$m se must be bit-equal")
        assert(s._8 == b.getDouble(6), s"$m t must be bit-equal")
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // the stratum cap fails LOUD, not silent state growth: a separate
    // monitor at maxStrata = 2 trips on the third stratum
    val prev2 = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in2 = MemoryStream[TwsPostStrat.StratumObs]
    val q2 = TwsPostStrat.monitor(in2.toDS(), maxStrata = 2)
      .writeStream.format("memory").queryName("tws_poststrat_cap")
      .outputMode("update").start()
    try {
      in2.addData(TwsPostStrat.StratumObs("m3", "a", 1.0, armA = true),
        TwsPostStrat.StratumObs("m3", "b", 1.0, armA = false))
      q2.processAllAvailable() // 2 strata: at the cap, fine
      val capEx = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        in2.addData(TwsPostStrat.StratumObs("m3", "c", 1.0, armA = true))
        q2.processAllAvailable()
      }
      assert(capEx.getMessage != null)
    } finally {
      q2.stop()
      prev2 match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState SRM guard: stream readout EQUALS the batch srmCheck, silent while one-armed") {
    // the TwsMsprt companion (TwsSrm): per-metric arm counts as value
    // state, the batch operator's own chi-square chain per micro-batch.
    // Integer counts are order-independent, so every snapshot must
    // equal Stats.srmCheck on the prefix it covers.
    import graft.streaming.{TwsMsprt, TwsSrm}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TwsMsprt.MetricObs]
    // e1: a broken 90/10 split sold as 50/50 — must alarm once n grows.
    // e2: one-armed all the way through — must NEVER emit.
    val batch1 = (1 to 20).map(i => TwsMsprt.MetricObs("e1", 0.0, i % 10 == 0)) ++
      (1 to 5).map(_ => TwsMsprt.MetricObs("e2", 0.0, armA = true))
    val batch2 = (21 to 200).map(i => TwsMsprt.MetricObs("e1", 0.0, i % 10 == 0)) ++
      (1 to 5).map(_ => TwsMsprt.MetricObs("e2", 0.0, armA = true))
    val q = TwsSrm.monitor(in.toDS(), ratioA = 0.5)
      .writeStream.format("memory").queryName("tws_srm_out")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("tws_srm_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      assert(snaps.count(_._1 == "e1") == 2, snaps.mkString(","))
      assert(!snaps.exists(_._1 == "e2"),
        "a one-armed metric must stay silent, not emit a degenerate row")
      // every e1 snapshot equals the batch srmCheck on its prefix
      val byN = snaps.filter(_._1 == "e1").map(s => (s._2 + s._3) -> s).toMap
      for ((n, rows) <- Seq(20 -> batch1.filter(_.metric == "e1"),
        200 -> (batch1 ++ batch2).filter(_.metric == "e1"))) {
        val b = graft.operators.Stats.srmCheck(
          rows.toDF("metric", "value", "armA"), col("armA"), ratioA = 0.5).head()
        val s = byN(n.toLong)
        assert(s._2 == b.getLong(0) && s._3 == b.getLong(1), s"n=$n counts")
        assert(s._4 == b.getDouble(2) && s._5 == b.getDouble(3), s"n=$n expected")
        assert(s._6 == b.getDouble(4), s"n=$n chi2 must be bit-equal")
        assert(s._7 == b.getBoolean(5), s"n=$n alarm flag")
      }
      // the planted 90/10 split must alarm by n=200
      assert(byN(200L)._7, "a 90/10 split sold as 50/50 must trip SRM")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState rolling distinct: MapState prunes to the watermark horizon") {
    import graft.streaming.{StatefulSessions, TwsRollingDistinct}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatefulSessions.Event]
    def sev(id: Long, minute: Int, user: Long, ty: String) = StatefulSessions.Event(
      id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      user, ty, 1.0)
    val withWm = in.toDS().withWatermark("ts", "10 minutes")
      .as[StatefulSessions.Event]
    val q = TwsRollingDistinct.distinctTypes(withWm, horizonMinutes = 60)
      .writeStream.format("memory").queryName("twsrd_out").outputMode("append").start()
    try {
      in.addData(sev(1, 10, 1, "a"), sev(2, 12, 1, "b"))
      q.processAllAvailable() // 2 distinct within horizon
      in.addData(sev(3, 560, 1, "a"))
      q.processAllAvailable() // watermark still at 2min: b not yet pruned
      in.addData(sev(9, 600, 9, "x")) // watermark → 590; timer for user 1 fires
      q.processAllAvailable()
      in.addData(sev(10, 660, 9, "x")) // one more batch so the timer batch runs
      q.processAllAvailable()
      val rows = spark.table("twsrd_out")
        .select("user_id", "n_distinct").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(rows.count(_ == (1L, 2)) >= 2, rows.toString) // both pre-prune emissions
      assert(rows.contains((1L, 1)), rows.toString) // post-prune: only a@560 lives
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState windowed quantiles: horizon rolls off, state survives restart") {
    // the bounded-horizon sibling of the all-history rolling quantiles
    // (TwsWindowedQuantiles): per-key ring of per-window KLL sketches
    // in MapState, merged on read. k exceeds the value counts, so the
    // exact no-compaction regime applies and every snapshot is the
    // exact ceil(p·n) order statistic of the HORIZON values. The
    // restart leg (q2 from q1's checkpoint) proves the per-window
    // RocksDB map rows survive a query restart; the roll-off leg
    // proves an advancing key drops windows past numWindows, and a
    // LATE row older than the horizon cannot resurrect one.
    import graft.streaming.{StatefulSessions, TwsWindowedQuantiles}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatefulSessions.Event]
    def vev(id: Long, minute: Int, v: Double) = StatefulSessions.Event(
      id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      1L, "a", v)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_twswq").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Seq[Double])]()
    def start(): StreamingQuery =
      TwsWindowedQuantiles.windowedQuantiles(
          in.toDS(), ps = Seq(0.5, 1.0), windowMinutes = 10, numWindows = 2,
          k = 1024)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[TwsWindowedQuantiles.WindowedSnapshot],
           _: Long) =>
            seen.synchronized {
              seen ++= b.collect().map(s => (s.key, s.window_start_ms, s.n, s.qs))
            }
            ()
        }.start()
    def winMs(minute: Int): Long =
      Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00").getTime
    val q1 = start()
    try {
      in.addData(vev(1, 0, 1.0), vev(2, 1, 2.0), vev(3, 2, 3.0), vev(4, 3, 4.0))
      q1.processAllAvailable() // window [0,10): n=4, p50=2, max=4
      in.addData(vev(5, 10, 5.0), vev(6, 11, 6.0))
      q1.processAllAvailable() // windows {0,10}: n=6, p50=3, max=6
    } finally q1.stop()
    val q2 = start() // recover — the per-window sketches must come back
    try {
      in.addData(vev(7, 20, 7.0))
      q2.processAllAvailable() // horizon slides to {10,20}: [0,10) rolls OFF
      in.addData(vev(8, 1, 99.0))
      q2.processAllAvailable() // late row in the dead window: no resurrection
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val snaps = seen.toSeq
    assert(snaps.contains((1L, winMs(0), 4L, Seq(2.0, 4.0))), snaps.toString)
    assert(snaps.contains((1L, winMs(10), 6L, Seq(3.0, 6.0))), snaps.toString)
    // post-restart: pre-restart values 5,6 still present (state
    // survived), window [0,10)'s 1..4 gone (rolled off) → 5,6,7
    assert(snaps.contains((1L, winMs(20), 3L, Seq(6.0, 7.0))), snaps.toString)
    // the late row was absorbed then evicted with its dead window:
    // horizon numbers unchanged, 99 nowhere
    assert(snaps.count(s => s._1 == 1L && s._2 == winMs(20) && s._3 == 3L) == 2,
      snaps.toString)
    assert(!snaps.exists(_._4.exists(_ == 99.0)), snaps.toString)
  }

  test("transformWithState HLL distinct: snapshot equals the batch estimator; ring rolls off") {
    // the sketch-as-state pattern applied to cardinality: fixed
    // 2^p-byte registers per key at ANY distinct count (where the
    // exact rolling distinct keeps one state row per live value). The
    // load-bearing assertion is EQUALITY with operators.Hll on the
    // same id multiset — the streaming estimate is the batch number,
    // not merely close to it.
    import graft.streaming.{StatefulSessions, TwsHllDistinct}
    import graft.operators.Hll
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def iev(id: Long, minute: Int, user: Long) = StatefulSessions.Event(
      id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      user, "a", 1.0)
    def batchEst(ids: Seq[Long]): Double =
      Hll.estimateDistinct(ids.toDF("id"), Seq.empty, $"id", p = 9)
        .head().getDouble(0)
    // ---- all-history processor ----
    val in = MemoryStream[StatefulSessions.Event]
    val q = TwsHllDistinct.distinctIds(in.toDS(), p = 9)
      .writeStream.format("memory").queryName("twshll_out")
      .outputMode("update").start()
    try {
      in.addData(((1L to 60L) ++ (1L to 10L)).map(i => iev(i, 0, 1L)): _*)
      q.processAllAvailable() // 70 events, 60 distinct
      in.addData((41L to 100L).map(i => iev(i, 1, 1L)): _*)
      q.processAllAvailable() // 130 events, 100 distinct all-history
      val snaps = spark.table("twshll_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(snaps.contains((70L, batchEst(1L to 60L))), snaps.toString)
      assert(snaps.contains((130L, batchEst(1L to 100L))), snaps.toString)
    } finally q.stop()
    // ---- bounded-horizon ring ----
    val in2 = MemoryStream[StatefulSessions.Event]
    val q2 = TwsHllDistinct.windowedDistinctIds(
        in2.toDS(), windowMinutes = 10, numWindows = 2, p = 9)
      .writeStream.format("memory").queryName("twshllw_out")
      .outputMode("update").start()
    try {
      in2.addData((1L to 40L).map(i => iev(i, 0, 2L)): _*)   // window [0,10)
      q2.processAllAvailable()
      in2.addData((21L to 60L).map(i => iev(i, 12, 2L)): _*) // window [10,20)
      q2.processAllAvailable() // horizon {w0,w1}: distinct 1..60
      in2.addData(iev(999L, 25, 2L))                         // window [20,30)
      q2.processAllAvailable() // w0 rolls OFF: distinct = {21..60, 999}
      val snaps = spark.table("twshllw_out").collect()
        .map(r => (r.getLong(2), r.getDouble(3))).toSet
      assert(snaps.contains((80L, batchEst(1L to 60L))), snaps.toString)
      // post-roll-off: w0's unique 1..20 no longer counted — n drops
      // to the horizon's 41 events and the estimate is the union of
      // the LIVE windows only (byte-max merge = registers of the union)
      assert(snaps.contains((41L, batchEst((21L to 60L) :+ 999L))), snaps.toString)
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming HLL registers EXPORT into the batch register table: union + re-max, estimate equals batch over the union") {
    // the TwsHllDistinct scaladoc claims its register state "could be
    // exported and merged into the batch register tables (union +
    // re-max) without translation" — proven here against REAL
    // persisted state: the checkpoint's RocksDB state is read back
    // with the state data source, the register blob becomes (bucket,
    // rho) rows, Hll.merge folds them into a batch-side register
    // table of a DIFFERENT id set, and the combined estimate is
    // EXACTLY the batch estimate over the union of inputs (same
    // splitmix64 coordinates both sides — the merged registers ARE
    // the union's registers, not an approximation of them).
    import graft.streaming.{StatefulSessions, TwsHllDistinct}
    import graft.operators.Hll
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val p = 9
    def iev(id: Long): StatefulSessions.Event = StatefulSessions.Event(
      id, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "a", 1.0)
    val streamIds = 1L to 60L   // absorbed by the stream
    val batchIds = 41L to 120L  // live only in the batch table (overlap 41..60)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_export").toString
    val in = MemoryStream[StatefulSessions.Event]
    val q = TwsHllDistinct.distinctIds(in.toDS(), p = p)
      .writeStream.format("memory").queryName("twshll_export")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      in.addData(streamIds.map(iev): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // the EXPORT: the persisted value state, read back from the
    // checkpoint — no processor code in the loop
    val state = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "regs").load()
    val blobs = state.select(col("value.*")).collect()
    assert(blobs.length == 1, state.schema.treeString + blobs.mkString("; "))
    val regs = blobs(0).getAs[Array[Byte]](0)
    assert(regs.length == (1 << p))
    val exported = regs.zipWithIndex.collect {
      case (rho, bucket) if rho != 0 => (bucket, rho.toInt)
    }.toSeq.toDF("bucket", "rho")
    // merge with a batch-side register table via the x_hll_merge
    // machinery, then estimate — must EQUAL the batch estimate over
    // the union of the two id sets
    val batchRegs = Hll.registers(batchIds.toDF("id"), Seq.empty, $"id", p)
    val combined = Hll.estimate(
      Hll.merge(exported, batchRegs, Seq.empty), Seq.empty, p).head().getDouble(0)
    val unionEst = Hll.estimateDistinct(
      (streamIds ++ batchIds).toDF("id"), Seq.empty, $"id", p).head().getDouble(0)
    assert(combined == unionEst, s"combined $combined != union $unionEst")
  }

  test("sliding window assigns each event to 4 overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = run("sliding_out", EventStreams.slidingCounts(in.toDF(), "10 minutes"))
    try {
      in.addData(ev(1, 30))
      q.processAllAvailable()
      in.addData(ev(2, 600, "c"))
      q.processAllAvailable()
      val n = spark.table("sliding_out")
        .where($"event_type" === "a").count()
      assert(n == 4) // 1h window / 15m slide → 4 covering windows
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String)

  test("stream-static join dimension refresh: frozen file list pinned, foreachBatch re-read is the fix") {
    // Operational trap, pinned empirically: a static parquet frame
    // captures its FILE LIST when the DataFrame is created — dimension
    // files appended while the stream runs are invisible to
    // EventStreams.enriched (slowly-changing dims silently go stale).
    // The supported refresh pattern is re-reading the dimension INSIDE
    // foreachBatch (per-batch plan → fresh listing). Both halves
    // asserted here so the behavior is documented, not folklore.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq((1L, "dimA")).toDF("k", "label").write.mode("overwrite").parquet(dir)
    val staticFrozen = spark.read.parquet(dir)
    val in = MemoryStream[Long]
    val joined = EventStreams.enriched(in.toDF().toDF("ek"), staticFrozen, "ek", "k")
    val q = joined.select($"ek", $"label").writeStream
      .format("memory").queryName("dimref_out").outputMode("append").start()
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
    val q2 = in.toDF().toDF("k").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val fresh = batch.sparkSession.read.parquet(dir) // re-listed per batch
        seen.synchronized {
          seen ++= batch.join(fresh, Seq("k"), "left")
            .collect().map(r => (r.getLong(0),
              if (r.isNullAt(1)) None else Some(r.getString(1))))
        }
        ()
      }.start()
    try {
      in.addData(2L)
      q.processAllAvailable(); q2.processAllAvailable()
      Seq((2L, "dimB")).toDF("k", "label").write.mode("append").parquet(dir)
      in.addData(2L)
      q.processAllAvailable(); q2.processAllAvailable()
      // frozen static: key 2 NEVER enriches, even after dimB landed
      val frozen = spark.table("dimref_out").collect()
        .map(r => (r.getLong(0), r.isNullAt(1))).toSeq
      assert(frozen.isEmpty || frozen.forall(_ == (2L, true)),
        s"frozen static must not see appended files: $frozen")
      // foreachBatch re-read: first batch misses, the batch after the
      // append sees dimB
      val got = seen.synchronized(seen.toList)
      assert(got.contains((2L, None)), got.toString)
      assert(got.contains((2L, Some("dimB"))), got.toString)
    } finally { q.stop(); q2.stop() }
  }

  test("StreamMetrics listener: batches/input_rows/state_rows reach the sink under one key") {
    import graft.jobs.MetricsSink
    import graft.streaming.StreamMetrics
    implicit val sqlCtx = spark.sqlContext
    val sink = new MetricsSink.InMemory
    val listener = new StreamMetrics(sink, prefix = "t")
    spark.streams.addListener(listener)
    val in = MemoryStream[Ev]
    val q = run("smx_out", EventStreams.tumblingCounts(in.toDF(), "10 minutes"))
    try {
      in.addData(ev(1, 5), ev(2, 7))
      q.processAllAvailable()
      in.addData(ev(3, 300, "b"))
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      spark.streams.removeListener(listener)
      // MemoryStream query name comes from the sink queryName
      assert(sink.value("t.smx_out.started") == 1L)
      assert(sink.value("t.smx_out.batches") >= 2L, sink.all.toString)
      assert(sink.value("t.smx_out.input_rows") == 3L, sink.all.toString)
      assert(sink.gaugeValue("t.smx_out.batch_ms").exists(_ >= 0.0))
      assert(sink.gaugeValue("t.smx_out.state_rows").exists(_ >= 1.0), // windowed agg keeps state
        sink.all.toString)
      // terminated lands under the remembered NAME, not the bare id
      val deadline = System.nanoTime() + 10_000_000_000L
      while (sink.value("t.smx_out.terminated") == 0L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(sink.value("t.smx_out.terminated") == 1L, sink.all.toString)
      assert(sink.value("t.smx_out.failed") == 0L)
    } finally {
      spark.streams.removeListener(listener)
      if (q.isActive) q.stop()
    }
  }

  test("streaming dedup filter: index grows per batch, cross- and within-batch dups drop") {
    import graft.streaming.StreamDedup
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    val (idx, out, ckpt) = (s"$dir/index", s"$dir/clean", s"$dir/ckpt")
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six seven"
    val q = StreamDedup.start(in.toDF(), "doc_id", "text", idx, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(Doc(1L, textA))
      q.processAllAvailable()
      // doc 2 near-dups the HISTORY (batch 1); doc 4 near-dups doc 3
      // WITHIN its own batch — min id survives each
      in.addData(Doc(2L, textA), Doc(3L, textB), Doc(4L, textB))
      q.processAllAvailable()
      val clean = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(clean == Set(1L, 3L))
      // index carries signatures for exactly the accepted docs
      val indexed = spark.read.parquet(idx).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 3L))
    } finally q.stop()
  }

  test("trending top-k: leaderboard tracks the running counts across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = graft.streaming.TrendingTopK.start(
      in.toDF(), "event_type", k = 2, trendingView = "trending_test")
    try {
      in.addData(ev(1, 1, "a"), ev(2, 2, "a"), ev(3, 3, "a"), ev(4, 4, "b"))
      q.processAllAvailable()
      def board(): Seq[(Int, String, Long)] =
        spark.table("trending_test").orderBy("rank")
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(board() == Seq((1, "a", 3L), (2, "b", 1L)))
      // b overtakes a; c enters but stays off the k=2 board
      in.addData(ev(5, 5, "b"), ev(6, 6, "b"), ev(7, 7, "b"), ev(8, 8, "c"))
      q.processAllAvailable()
      assert(board() == Seq((1, "b", 4L), (2, "a", 3L)))
    } finally q.stop()
  }

  test("windowed trending boards: one append-mode board per finalized window, late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = run("winboard_out", graft.streaming.TrendingTopK.windowedBoards(
      in.toDF(), "ts", "event_type", k = 2,
      windowDuration = "10 minutes", delayThreshold = "5 minutes"))
    try {
      def boards(): Seq[(String, Int, String, Long)] =
        spark.table("winboard_out").orderBy("win_start", "rank")
          .collect().map(r => (r.getTimestamp(0).toString.substring(11, 16),
            r.getInt(2), r.getString(3), r.getLong(4))).toSeq
      // window [00:00,00:10): a=3, b=1, c=1 → board (a,3),(b or c,1) —
      // TopK's struct order breaks the tie to the LARGER key, so c;
      // window [00:10,00:20): b=2, a=1
      in.addData(ev(1, 1, "a"), ev(2, 2, "a"), ev(3, 3, "a"), ev(4, 4, "b"),
        ev(5, 5, "c"), ev(6, 11, "b"), ev(7, 12, "b"), ev(8, 13, "a"))
      q.processAllAvailable()
      assert(boards().isEmpty) // append mode: nothing finalizes until the watermark moves
      in.addData(ev(9, 300, "z")) // watermark → 04:55, both windows finalize
      q.processAllAvailable()
      assert(boards() == Seq(
        ("00:00", 1, "a", 3L), ("00:00", 2, "c", 1L),
        ("00:10", 1, "b", 2L), ("00:10", 2, "a", 1L)))
      // a row 5 hours late for the finalized 00:00 window: dropped by
      // the watermark, the published board is never amended
      in.addData(ev(10, 7, "b"))
      q.processAllAvailable()
      assert(boards() == Seq(
        ("00:00", 1, "a", 3L), ("00:00", 2, "c", 1L),
        ("00:10", 1, "b", 2L), ("00:10", 2, "a", 1L)))
      // state is watermark-bounded: the finalized windows' rows were
      // evicted — only the open 05:00 window's state remains across
      // both stateful operators
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.map(_.numRowsTotal).sum <= 2,
        state.map(s => s.operatorName + "=" + s.numRowsTotal).mkString(","))
    } finally q.stop()
  }

  test("streaming funnel: cross-batch chain, gap stops the chain, lapsed state expires") {
    import graft.streaming.StreamingFunnel
    implicit val sqlCtx = spark.sqlContext
    def fev(minute: Int, user: Long, typ: String) = StreamingFunnel.Event(
      Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, typ)
    val in = MemoryStream[StreamingFunnel.Event]
    val q = StreamingFunnel.advances(
        in.toDS().withWatermark("ts", "5 minutes"),
        Seq("a", "b", "c"), maxGapMinutes = Some(30))
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      // batch 1: u1 starts; u2's b without an a does nothing
      in.addData(fev(0, 1, "a"), fev(0, 2, "b"))
      q.processAllAvailable()
      // batch 2: u1 advances b (cross-batch chain); a repeat 'a' is a no-op
      in.addData(fev(10, 1, "b"), fev(11, 1, "a"))
      q.processAllAvailable()
      // batch 3: u1's c at minute 50 is 40 min past b's reach — outside
      // the 30-min gap, no advance; u3 starts a chain
      in.addData(fev(50, 1, "c"), fev(50, 3, "a"))
      q.processAllAvailable()
      // batch 4: watermark jumps far ahead → u3's lapsed state times out
      in.addData(fev(600, 4, "a"))
      q.processAllAvailable()
      // batch 5: u3's b arrives after expiry (and past its gap) — nothing
      in.addData(fev(610, 3, "b"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .select("user_id", "step", "event_type").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(rows == Set((1L, 1, "a"), (1L, 2, "b"), (3L, 1, "a"), (4L, 1, "a")))
      // u1 expired at batch 4 (timeout 0:40 < watermark 0:45); state
      // holds at most u4's fresh chain + u3's late-data-touched record
      val state = q.lastProgress.stateOperators
      assert(state.map(_.numRowsTotal).sum <= 2,
        state.map(s => s.operatorName + "=" + s.numRowsTotal).mkString(","))
    } finally q.stop()
  }
}
