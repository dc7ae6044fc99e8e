package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.AsOfJoin
import graft.streaming.EventStreams

/** Event-stream queries: declared Q19 (JSON extraction), Q21 (tumbling
  * window batch form), Q22 (as-of join), plus sliding-window and
  * sessionization batch equivalents of the Structured Streaming
  * operators (SURVEY §2.B X9/X10/X11/X19/X22; streaming forms live in
  * graft.streaming and are exercised by MemoryStream tests).
  */
object Events {
  private type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private val D = "decimal(18,2)"

  val defs: Map[String, Q] = Map(
    "q19_json" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    }),

    "q21_tumbling" -> ((s, dir) => {
      // streaming-equivalent tumbling window; window() start is the
      // epoch-aligned hour bucket, identical to date_trunc('hour').
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          // decimal sum internally (exact, order-free); DOUBLE final
          // output — driver's decimal hash is rendering-sensitive.
          sum(col("value").cast(D)).cast("double").as("sv"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sv"))
        .orderBy("ws", "event_type")
    }),

    "x_sliding_window" -> ((s, dir) => {
      // two-level sliding window: aggregate per 15-minute BASE bucket
      // first, then expand each bucket row into the 4 one-hour windows
      // containing it and re-aggregate. Result-identical to
      // window(ts, '1 hour', '15 minutes') — an event's 4 windows start
      // at its bucket minus {0,15,30,45} min — but the 4× Expand runs
      // over |buckets| pre-aggregated rows instead of |events| raw
      // rows, shrinking the expand+shuffle input by the events-per-
      // bucket factor (the number that grows with scale). The
      // streaming form keeps the canonical single-level plan
      // (EventStreams.slidingCounts); this is the batch scale shape.
      val base = ev(s, dir)
        .groupBy(window(col("ts"), "15 minutes").getField("start").as("bs"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      base.select(col("event_type"), col("c"),
          explode(array((0 until 4).map(i =>
            col("bs") - expr(s"INTERVAL ${15 * i} MINUTES")): _*)).as("ws"))
        .groupBy("ws", "event_type").agg(sum(col("c")).as("cnt"))
        .select(col("ws"), col("event_type"), col("cnt"))
        .orderBy("ws", "event_type")
    }),

    "x_interval_join" -> ((s, dir) => {
      // batch form of the stream-STREAM interval join (X13) through
      // the SAME builder the streaming tests exercise — withWatermark
      // is a no-op on batch frames, so the join semantics get a full
      // DuckDB value oracle here while the state-bounded streaming
      // behavior is MemoryStream-spec'd (round-2 verdict item 4).
      // Shape: view → purchase attribution within 30 minutes.
      val e = ev(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
          col("ts").as("b_ts"))
      EventStreams.intervalJoin(views, buys, "v_user", "b_user", "v_ts", "b_ts",
          interval = "30 minutes")
        .select(col("view_id"), col("buy_id"),
          expr("(unix_micros(b_ts) - unix_micros(v_ts)) div 1000000").as("lag_s"))
        .orderBy("view_id", "buy_id")
    }),

    "q22_asof" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      AsOfJoin.asOf(
        left = e, leftKey = "user_id", leftTime = "ts",
        right = o, rightKey = "o_custkey", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"))
        .filter(col("o_orderkey").isNotNull) // inner as-of semantics (Q22)
        .select(col("event_id"), col("o_orderkey").as("ok"))
        .orderBy("event_id")
    }),

    "x_asof_salted" -> ((s, dir) => {
      // the skew-salted as-of variant on q22's exact shape: identical
      // output (the oracle IS q22's) through (key, 30-day-bucket)
      // shuffles — the hot-user_id straggler defense at 100 TB
      val e = ev(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      AsOfJoin.asOfSalted(
        left = e, leftKey = "user_id", leftTime = "ts",
        right = o, rightKey = "o_custkey", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"), bucketWidth = 30L * 86400)
        .filter(col("o_orderkey").isNotNull)
        .select(col("event_id"), col("o_orderkey").as("ok"))
        .orderBy("event_id")
    }),

    "x_sessionize" -> ((s, dir) => {
      // batch sessionization: session break when gap > 30 min; running
      // sum of breaks numbers the sessions per user.
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = ev(s, dir).withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
      gapped
        .withColumn("session_id",
          sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("sess_start"))
        .orderBy("user_id", "session_id")
    }),

    "x_skew_report" -> ((s, dir) =>
      // join-key skew diagnostic on the stream's natural join key —
      // the report run before choosing plain vs salted vs AQE-split
      // joins at scale (one row: count distribution over keys)
      graft.operators.ScaleJoins.keySkewReport(ev(s, dir), "user_id"))
  )

  val oracle: Map[String, String] = Map(
    "q19_json" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q21_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_sliding_window" ->
      """SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) AS TIMESTAMP)
        |         - i * INTERVAL '15 minutes' AS ws,
        |       event_type, COUNT(*) AS cnt
        |FROM events, unnest(range(4)) AS t(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_interval_join" ->
      """SELECT v.event_id AS view_id, b.event_id AS buy_id,
        |  CAST((epoch_us(b.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_s
        |FROM events v JOIN events b
        |  ON v.user_id = b.user_id
        | AND v.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL '30 minutes'
        |ORDER BY view_id, buy_id""".stripMargin,
    "q22_asof" ->
      """WITH m AS (
        |  SELECT e.event_id, MAX(o.o_orderdate) AS od FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  GROUP BY e.event_id)
        |SELECT m.event_id, MAX(o.o_orderkey) AS ok
        |FROM m JOIN events e ON e.event_id = m.event_id
        |JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate = m.od
        |GROUP BY m.event_id ORDER BY m.event_id""".stripMargin,
    // the salted variant must be bit-identical to the plain as-of —
    // the oracle is q22's verbatim
    "x_asof_salted" ->
      """WITH m AS (
        |  SELECT e.event_id, MAX(o.o_orderdate) AS od FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  GROUP BY e.event_id)
        |SELECT m.event_id, MAX(o.o_orderkey) AS ok
        |FROM m JOIN events e ON e.event_id = m.event_id
        |JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate = m.od
        |GROUP BY m.event_id ORDER BY m.event_id""".stripMargin,
    "x_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       COUNT(*) AS n_events, CAST(MIN(ts) AS TIMESTAMP) AS sess_start
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "x_skew_report" ->
      """WITH k AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1)
        |SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  ROUND(AVG(cnt), 4) AS avg_cnt,
        |  quantile_cont(cnt, 0.5) AS med_cnt,
        |  quantile_cont(cnt, 0.99) AS p99_cnt,
        |  CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |  ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 4) AS top_share,
        |  ROUND(CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt), 4) AS skew_ratio
        |FROM k""".stripMargin
  )
}
