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
