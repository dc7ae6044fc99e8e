package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profiling, Stats}

/** The sketch-backed scale paths of the DERIVED grouped statistics —
  * winsorized/trimmed means, MAD outlier reports, grouped Gini. Each
  * sibling replaces the exact operators' guarded driver fold with
  * KLL-sketch passes (O(k·log n) state per group, output distributed),
  * so the contract to pin is convergence: exact-regime equality on
  * small data (k > n — no compactor fires, the sketch read IS the
  * interpolated percentile) and a stated ε against the exact operator
  * on the sf0.1 corpus where compaction is real.
  */
class SketchScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.1"

  test("winsorizedStatsSketch: exact regime (k > n) matches the exact operator") {
    val rnd = new scala.util.Random(11)
    // values on the 2-dp grid (the decimal(28,6) moment contract)
    val rows = (1 to 800).map(i =>
      (s"g${i % 3}", math.round(rnd.nextDouble() * 10000).toDouble / 100))
    val df = rows.toDF("g", "v")
    val exact = Stats.winsorizedStats(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val sk = Stats.winsorizedStatsSketch(df, "g", "v", k = 4096).collect()
    assert(sk.length == exact.size)
    sk.foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1)) // n
      // bounds off the same lerp arithmetic; means exact given bounds
      Seq(2, 3, 4, 5).foreach { i =>
        assert(math.abs(r.getDouble(i) - e.getDouble(i)) <= 1e-9,
          s"${r.getString(0)} col $i: sketch ${r.getDouble(i)} vs exact ${e.getDouble(i)}")
      }
    }
  }

  test("madOutliersSketch: exact regime (k > n) matches the exact operator") {
    val rnd = new scala.util.Random(12)
    val rows = (1 to 600).map(i =>
      (s"t${i % 2}", math.round(rnd.nextGaussian() * 1000).toDouble / 100)) :+
      (("t0", 90.0)) :+ (("t1", -90.0)) // two genuine outliers
    val df = rows.toDF("g", "v")
    val exact = Profiling.madOutliers(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val sk = Profiling.madOutliersSketch(df, "g", "v", k = 4096).collect()
    assert(sk.length == exact.size)
    sk.foreach { r =>
      val e = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e.getDouble(1)) <= 1e-9, "med")
      assert(math.abs(r.getDouble(2) - e.getDouble(2)) <= 1e-9, "mad")
      assert(r.getLong(3) == e.getLong(3), "n_outliers")
      assert(r.getLong(4) == e.getLong(4), "n")
    }
  }

  test("groupedGiniSketch: uniform 1..n reads the analytic (n-1)/(3n) within grid error") {
    val n = 5000
    val df = (1 to n).map(i => ("u", i.toDouble)).toDF("g", "v")
    val g = Stats.groupedGiniSketch(df, "g", "v", k = 8192, grid = 1024)
      .head().getDouble(3)
    val want = (n - 1).toDouble / (3.0 * n)
    assert(math.abs(g - want) <= 0.005, s"gini $g vs analytic $want")
  }

  test("sf0.1: sketch-backed winsorized/MAD/Gini within stated eps of exact") {
    assume(new java.io.File(sf01).isDirectory, s"$sf01 not present")
    val li = graft.core.Tables.load(spark, sf01, "lineitem")

    // winsorized: bounds carry ~1/k rank error; means exact given
    // bounds — relative ε 1% at k=4096 has wide headroom
    val we = Stats.winsorizedStats(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r).toMap
    val ws = Stats.winsorizedStatsSketch(
      li, "l_returnflag", "l_extendedprice", k = 4096).collect()
    assert(ws.length == we.size && ws.nonEmpty)
    ws.foreach { r =>
      val e = we(r.getString(0))
      assert(r.getLong(1) == e.getLong(1), "n must be exact")
      Seq(2, 3, 4, 5).foreach { i =>
        val rel = math.abs(r.getDouble(i) - e.getDouble(i)) /
          math.max(1e-12, math.abs(e.getDouble(i)))
        assert(rel <= 0.01,
          s"${r.getString(0)} col $i rel err $rel: ${r.getDouble(i)} vs ${e.getDouble(i)}")
      }
    }

    // MAD report on the events values
    val ev = graft.core.Tables.load(spark, sf01, "events")
    val me = Profiling.madOutliers(ev, "event_type", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    val ms = Profiling.madOutliersSketch(ev, "event_type", "value", k = 4096)
      .collect()
    assert(ms.length == me.size && ms.nonEmpty)
    ms.foreach { r =>
      val e = me(r.getString(0))
      val relMed = math.abs(r.getDouble(1) - e.getDouble(1)) /
        math.max(1e-12, math.abs(e.getDouble(1)))
      val relMad = math.abs(r.getDouble(2) - e.getDouble(2)) /
        math.max(1e-12, math.abs(e.getDouble(2)))
      assert(relMed <= 0.01, s"${r.getString(0)} med rel err $relMed")
      assert(relMad <= 0.02, s"${r.getString(0)} mad rel err $relMad")
      assert(r.getLong(4) == e.getLong(4), "n must be exact")
      val rateDiff = math.abs(r.getDouble(5) - e.getDouble(5))
      assert(rateDiff <= 0.01, s"${r.getString(0)} outlier_rate diff $rateDiff")
    }

    // grouped Gini on document lengths: quadrature (1/grid) + sketch
    // (1/k) error — absolute ε 0.02 on a [0,1] statistic
    val docs = graft.core.Tables.load(spark, sf01, "documents")
    val ge = Stats.groupedGini(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val gs = Stats.groupedGiniSketch(docs, "source", "n_chars",
      k = 4096, grid = 1024).collect()
    assert(gs.length == ge.size && gs.nonEmpty)
    gs.foreach { r =>
      val diff = math.abs(r.getDouble(3) - ge(r.getString(0)))
      assert(diff <= 0.02, s"${r.getString(0)} gini diff $diff")
    }
  }

  test("groupedGiniSketch: negative values fail loud, distributed") {
    val df = Seq(("a", -1.0), ("a", 2.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Stats.groupedGiniSketch(df, "g", "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("Lorenz")), e.getMessage)
  }

  test("bootstrapQuantileCI: CI brackets the point estimate, deterministic, exact regime") {
    val rows = (1 to 400).map(i => (i.toDouble, i.toLong))
    val df = rows.toDF("v", "key")
    val out = Stats.bootstrapQuantileCI(df, "v", "key",
      ps = Seq(0.5, 0.9), b = 100, k = 65536)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(0.5, 0.9))
    val (bEff, n, q50, lo50, hi50) = out(0.5)
    assert(n == 400L && bEff >= 95L)
    // exact regime: the identity resample's p50 is the exact order
    // statistic ceil(0.5*400) = 200
    assert(q50 == 200.0, s"q50 $q50")
    assert(lo50 <= q50 && q50 <= hi50, s"[$lo50, $hi50] vs $q50")
    assert(lo50 < hi50) // a real interval, not a point
    val (_, _, q90, lo90, hi90) = out(0.9)
    assert(q90 == 360.0 && lo90 <= q90 && q90 <= hi90)
    // hash-derived weights: bit-identical across runs
    val again = Stats.bootstrapQuantileCI(df, "v", "key",
      ps = Seq(0.5, 0.9), b = 100, k = 65536)
      .collect().map(r => (r.getDouble(0), r.getDouble(4), r.getDouble(5))).toSet
    assert(again == Set((0.5, lo50, hi50), (0.9, lo90, hi90)))
    // duplicate keys fail loud (the sentinel now rides the fan-out
    // shuffle as an in-plan raise_error, so it surfaces as a task
    // failure — search the cause chain for the named message)
    def chainMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ chainMessages(x.getCause))
    val dup = (1 to 40).map(i => (i.toDouble, (i % 7).toLong)).toDF("v", "key")
    val e = intercept[Exception] {
      Stats.bootstrapQuantileCI(dup, "v", "key").collect()
    }
    assert(chainMessages(e).exists(_.contains("uniquely identify")), e.toString)
  }

  test("bootstrap CIs fail loud on duplicate keys (correlated draws)") {
    def chainMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ chainMessages(x.getCause))
    val df = (1 to 50).map(i => (i.toDouble, (i % 10).toLong)).toDF("v", "k")
    val e1 = intercept[Exception] {
      Stats.bootstrapMeanCI(df, "v", "k").collect()
    }
    assert(chainMessages(e1).exists(_.contains("uniquely identify")), e1.toString)
    val e2 = intercept[Exception] {
      Stats.bootstrapDiffCI(df, "v", "k", col("v") > 25).collect()
    }
    assert(chainMessages(e2).exists(_.contains("uniquely identify")), e2.toString)
  }

  test("weighted quantile family fails loud on fractional weights") {
    val frac = Seq(("a", 1.0, 1.5), ("a", 2.0, 2.0)).toDF("g", "v", "w")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e1 = intercept[Exception] {
      Stats.groupedQuantilesSketchWeighted(frac, "g", "v", "w", Seq(0.5)).collect()
    }
    assert(messages(e1).exists(_.contains("fractional weight")), e1.getMessage)
    val e2 = intercept[Exception] {
      Stats.groupedInterpolatedQuantilesWeighted(frac, "g", "v", "w", Seq(0.5)).collect()
    }
    assert(messages(e2).exists(_.contains("fractional weight")), e2.getMessage)
    // integral weights in a double column still work
    val ok = Seq(("a", 1.0, 2.0), ("a", 5.0, 2.0)).toDF("g", "v", "w")
    assert(Stats.groupedQuantilesSketchWeighted(ok, "g", "v", "w", Seq(1.0))
      .head().getLong(2) == 4L)
  }
}
