package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftExtensions, Sessions}

/** SparkSessionExtensions wiring: graft functions usable from plain
  * SQL, optimizer rule folds self-cosine. Needs its own session (the
  * shared TestSpark one was built without extensions). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would hand back the shared non-extended session —
    // clear the default, build the extended one (reusing the same
    // SparkContext), then restore so other suites are unaffected.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = Sessions.configure(
      SparkSession.builder().master("local[2]").withExtensions(new GraftExtensions)
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_ext_wh").toString),
      shufflePartitions = 2, appName = "graft-ext-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    prev match {
      case Some(p) =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      case None =>
        // don't leak this session as the default — TestSpark.spark must
        // build its own (temp-warehouse) session when it initializes
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
    }
    s
  }

  test("native functions callable from SQL on an extended session") {
    val r = spark.sql(
      """SELECT graft_fnv64('a') AS h,
        |       graft_simhash64(graft_shingle_hashes('a b c d e', 3)) AS sh,
        |       size(graft_minhash_sig(graft_shingle_hashes('a b c d e', 3), 16)) AS k,
        |       graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_hll_register(graft_fnv64('a'), 9) AS reg""".stripMargin).head()
    assert(r.getLong(0) == 0xaf63dc4c8601ec8cL)
    assert(r.getInt(2) == 16)
    assert(r.getDouble(3) == 1.0)
    val reg = r.getSeq[Int](4)
    assert(reg == Seq(graft.functions.HllRegister.compute(0xaf63dc4c8601ec8cL, 9).getInt(0),
      graft.functions.HllRegister.compute(0xaf63dc4c8601ec8cL, 9).getInt(1)))
  }

  test("KLL sketch family callable from SQL on an extended session — full roll-up chain") {
    // build per-shard sketch state, merge, read both ways, plus the
    // direct quantile aggregates (raw + weighted) — all through plain
    // SQL on the extension registry, no column-API registration calls
    spark.range(100)
      .selectExpr("id % 2 AS shard", "CAST(id + 1 AS DOUBLE) AS v", "id % 3 + 1 AS w")
      .createOrReplaceTempView("ext_kll_in")
    val r = spark.sql(
      """WITH shards AS (
        |  SELECT shard, graft_kll_sketch(v, 4096) AS sk,
        |         graft_kll_sketch_w(v, w, 4096) AS skw
        |  FROM ext_kll_in GROUP BY shard),
        |m AS (SELECT graft_kll_merge(sk) AS m1, graft_kll_merge(skw) AS m2
        |      FROM shards)
        |SELECT graft_kll_values(m1, array(0.5D, 1.0D)) AS ex,
        |       graft_kll_values_interp(m1, array(0.0D, 0.5D)) AS ip,
        |       graft_kll_values(m2, array(1.0D)) AS wx
        |FROM m""".stripMargin).head()
    // 1..100 unweighted: exact-rank p50 = 50, max = 100; interp p0 = 1,
    // p50 = (99·0.5 lerp) = 50.5
    assert(r.getSeq[Double](0) == Seq(50.0, 100.0), r.toString)
    assert(r.getSeq[Double](1) == Seq(1.0, 50.5), r.toString)
    assert(r.getSeq[Double](2) == Seq(100.0), r.toString)
    val agg = spark.sql(
      """SELECT graft_kll_quantiles(v, array(1.0D), 4096) AS q,
        |       graft_kll_quantiles_w(v, w, array(1.0D), 4096) AS qw
        |FROM ext_kll_in""".stripMargin).head()
    assert(agg.getSeq[Double](0) == Seq(100.0) && agg.getSeq[Double](1) == Seq(100.0))
  }

  test("chunk/rolling/overlap/top-k functions callable from SQL") {
    val r = spark.sql(
      """SELECT graft_chunk_strings('a b c d e', 2) AS cs,
        |       graft_chunk_hashes('a b c d e', 2) AS ch,
        |       graft_rolling_hashes('a b c d e', 2) AS rh,
        |       graft_overlap_chunks('a b c d e', 3, 2) AS oc""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "c d", "e"))
    assert(r.getSeq[Long](1).length == 3)
    assert(r.getSeq[Long](2).length == 4)  // stride-1 full windows
    assert(r.getSeq[String](3) == Seq("a b c", "c d e"))
    // aggregate form: top-2 of a grouped value straight from SQL
    val t = spark.sql(
      """SELECT g, graft_top_k(v, 2) AS top FROM VALUES
        |  (0, 5), (0, 9), (0, 1), (1, 4) AS t(g, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(t(0).getSeq[Int](1) == Seq(9, 5))
    assert(t(1).getSeq[Int](1) == Seq(4))
  }

  test("optimizer folds cosine(x, x) to a literal") {
    // parquet-backed (a LocalRelation would be eagerly evaluated by
    // ConvertToLocalRelation before the user rule batch runs)
    val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id", "graft_cosine(embedding, embedding) AS c")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosine_similarity"), optimized)
    assert(optimized.contains("1.0"), optimized)
    // every value EXACTLY 1.0 — float self-cosine computed numerically
    // would give 0.99999…, so exactness proves the rule fired
    assert(df.filter(org.apache.spark.sql.functions.col("c") =!= 1.0).count() == 0)
  }
}
