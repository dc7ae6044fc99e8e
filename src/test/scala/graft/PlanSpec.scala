package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression net (SURVEY §4): the optimizations that
  * matter at 100 TB — scan pushdown, column pruning, broadcast joins,
  * top-k without a global sort, partial aggregation — must stay in the
  * plan, not just in the results.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(FormattedMode)

  test("q02: predicates pushed into the parquet scan, columns pruned") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    // only the 5 referenced columns are read, not all 11
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.split(",").length == 5, read)
    assert(!read.contains("l_extendedprice"))
  }

  test("q03/q04/q14: dimension joins broadcast, not shuffled") {
    assert(plan("q03_left_join").contains("BroadcastHashJoin LeftOuter"))
    assert(plan("q04_join_chain").contains("BroadcastHashJoin"))
    val anti = plan("q14_anti_join")
    assert(anti.contains("BroadcastHashJoin LeftAnti"))
    assert(anti.contains("GreaterThan(o_totalprice,450000.0)")) // filter reached the scan
    assert(!plan("q03_left_join").contains("SortMergeJoin"))
  }

  test("q05/q18/x_ann: global top-k is TakeOrderedAndProject, no full sort") {
    assert(plan("q05_sort_limit").contains("TakeOrderedAndProject"))
    assert(plan("q18_cosine_pairs").contains("TakeOrderedAndProject"))
    assert(plan("x_ann_topk").contains("TakeOrderedAndProject"))
    assert(plan("x_ann_topk").contains("BroadcastNestedLoopJoin")) // 1-row query side
  }

  test("x_length_trim/x_mixture_plan: tiny derived tables broadcast back, corpus not sort-merge-joined") {
    val trim = plan("x_length_trim")
    assert(trim.contains("BroadcastHashJoin"), trim)
    assert(!trim.contains("SortMergeJoin"), "bounds join must broadcast")
    val mix = plan("x_mixture_plan")
    assert(mix.contains("BroadcastNestedLoopJoin") || mix.contains("BroadcastHashJoin"),
      "1-row totals must broadcast")
    assert(!mix.contains("SortMergeJoin"))
  }

  test("percentile family: no buffer-everything Percentile aggregate remains") {
    // round-8 verdict finding #1: every interpolated-percentile call
    // site now reads the bucketed prefix-sum CDF — the `percentile`
    // aggregate (per-group buffer of EVERY value, the 100 TB cliff)
    // must not reappear in any of these plans
    for (q <- Seq("x_percentiles", "x_winsorize", "x_outliers",
        "x_length_trim", "x_skew_report")) {
      val p = plan(q).toLowerCase
      assert(!p.contains("percentile"),
        s"$q still carries a percentile aggregate")
    }
  }

  test("x_snapshot_diff: full-outer join on the key only, no cartesian") {
    val p = plan("x_snapshot_diff")
    assert(p.contains("FullOuter"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q07: partial (map-side) aggregation before the shuffle") {
    val p = plan("q07_agg")
    val aggIdx = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.trim.matches("""\(\d+\) HashAggregate.*""") => i
    }.toSeq
    assert(aggIdx.size >= 2, "expected partial+final HashAggregate")
  }

  test("q22 as-of join: one shuffle on the key, window, no range cross-join") {
    val p = plan("q22_asof")
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // exactly one shuffle before the window (plus the output sort)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"unexpected extra shuffles:\n$p")
  }

  test("bucketed tables join with zero exchanges") {
    import graft.operators.ScaleJoins
    val o = graft.core.Tables.load(spark, sfDir, "orders")
    val l = graft.core.Tables.load(spark, sfDir, "lineitem")
    ScaleJoins.writeBucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", 8, Seq("o_orderkey"))
    ScaleJoins.writeBucketed(l.select("l_orderkey", "l_quantity"), "b_lineitem", 8, Seq("l_orderkey"))
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val p = joined.queryExecution.explainString(FormattedMode)
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange.*""")),
      s"bucketed join should not shuffle:\n$p")
    assert(joined.count() == l.count()) // every lineitem has its order
  }

  test("salted join returns exactly the plain join's rows") {
    import graft.operators.ScaleJoins
    val l = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = l.join(o, Seq("k")).groupBy("k").count()
    val salted = ScaleJoins.saltedJoin(l, o, "k", saltFactor = 4).groupBy("k").count()
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("events scan prunes to referenced columns only") {
    val p = plan("q19_json")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("event_type") && read.contains("props"))
    assert(!read.contains("user_id") && !read.contains("value"))
  }

  test("x_ivf_topk: centroid/probe sides broadcast, top-k via TakeOrdered") {
    val p = plan("x_ivf_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p) // corpus never shuffle-joined
    // round-2 verdict: assignment must be narrow. The only shuffles
    // allowed are centroid/probe-side (single-row collect_list agg and
    // the nprobe ordering) — no Exchange may ever carry the corpus
    // embedding column. Formatted explain prints each Exchange node's
    // schema on the next "Input [...]" line.
    val lines = p.linesIterator.toVector
    val exchangeInputs = lines.zipWithIndex.collect {
      case (l, i) if l.trim.matches("""\(\d+\) Exchange""") =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
    }
    assert(exchangeInputs.size <= 2, s"unexpected extra shuffles:\n$p")
    assert(!exchangeInputs.exists(_.contains("embedding#")),
      s"an exchange carries corpus embeddings:\n$p")
    assert(p.contains("nearest_centroid"), p)
  }

  test("x_hard_negatives_ivf: candidates from a cell-keyed HASH join, TopK partially aggregated") {
    // the index-scale hard-negative miner must never degrade to the
    // brute-force form's BroadcastNestedLoopJoin (no equi-key) or a
    // CartesianProduct: the coarse-cell id IS the equi-key, so the
    // planner picks a hash join (broadcast at sf0.01 where the
    // exploded probe side is tiny; shuffle-hash/sort-merge on the
    // same key at scale — either way candidates exist only per cell),
    // and the per-query TopK reduction must be partial+final (map-side
    // combine: k rows per (query, partition) ever shuffle)
    val p = plan("x_hard_negatives_ivf")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"TopK must partial-aggregate before the qid shuffle:\n$p")
  }

  test("x_bucketed_join: fact-fact join consumes bucketed scans with no join-side shuffle") {
    val p = plan("x_bucketed_join")
    // both scans bucketed, join needs no exchange — the only shuffles
    // are the 5-group aggregation and the output sort
    assert(p.linesIterator.count(_.contains("Bucketed: true")) == 2, p)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"join-side shuffle crept in:\n$p")
  }

  test("x_hard_negatives_part: dynamic partition pruning reaches the cell-partitioned candidate scan") {
    // round-17 verdict item 5: the hardNegativesIvf scaladoc's "cell id
    // becomes a partition column at ingest, making the join co-located"
    // claim, now a locked plan shape — the x_dpp_join pattern on an ANN
    // index. The candidate scan must read the hive cell layout with a
    // runtime pruning subquery fed from the broadcast query batch, so
    // at 100 TB only the probed nprobe/|cells| directories are read.
    val p = plan("x_hard_negatives_part")
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"no cell PartitionFilters line:\n$p")
  }

  test("x_dpp_join: dynamic partition pruning subquery reaches the fact scan") {
    val p = plan("x_dpp_join")
    // the fact scan's partition filters must carry the runtime pruning
    // subquery fed from the (broadcast) filtered dimension — the plan
    // shape that lets a 100 TB partitioned fact read ~3 of ~83 month
    // directories instead of all of them
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_sliding_window: pre-aggregated two-level form — expand runs AFTER the first agg") {
    val p = plan("x_sliding_window")
    // two HashAggregate pairs (base bucket agg, window re-agg) with the
    // Generate (explode) between them: the 4× expansion multiplies
    // |buckets| pre-aggregated rows, not |events|. The tree prints
    // top-down, so the BASE aggregate is the last HashAggregate line
    // and must sit below the Generate.
    val lines = p.linesIterator.toVector
    val aggIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("HashAggregate") => i
    }
    val gen = lines.indexWhere(_.contains("Generate"))
    assert(aggIdx.size >= 4, s"expected two partial+final agg pairs:\n$p")
    assert(gen >= 0 && aggIdx.head < gen && gen < aggIdx.last,
      s"explode should consume the aggregated buckets:\n$p")
  }

  test("x_scrub/x_bpe_tokens: narrow scrub/tokenize — no shuffle except the output sort") {
    for (q <- Seq("x_scrub", "x_bpe_tokens")) {
      val p = plan(q)
      val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
      assert(exchanges <= 1, s"$q should only shuffle for the final sort:\n$p")
      assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), q)
    }
  }

  test("x_stat_aggs/x_sample: partial aggregation before the single keyed shuffle") {
    for (q <- Seq("x_stat_aggs", "x_sample")) {
      val p = plan(q)
      val aggs = p.linesIterator.count(_.trim.matches("""\(\d+\) HashAggregate.*"""))
      assert(aggs >= 2, s"$q expected partial+final HashAggregate:\n$p")
    }
  }

  test("x_blocklist: bloom probe survives to the physical plan over parquet") {
    val p = plan("x_blocklist")
    // the codegen'd might_contain prefilter gates the anti-join branch;
    // exactly one real join remains (the exactness anti-join)
    assert(p.contains("might_contain"))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("x_kmeans stages: narrow assignment, update shuffles only (cid, dim) partials") {
    // mirror of Clustering.kmeansAssign's per-iteration plan (built
    // inline because the operator checkpoints its result, collapsing
    // the interesting stages): a plan that shuffles vectors for the
    // assignment or the update is the IVF mistake resurfacing.
    import graft.functions.{NearestCentroid, QuantizeVec}
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
    val q = e.select(col("vec_id").as("__id"),
      QuantizeVec.quantize(spark, col("embedding"), 10000).as("__qv"))
    val centArr = q.orderBy("__id").limit(4)
      .agg(array_sort(collect_list(struct(
        col("__id").as("cid"), col("__qv").as("cv")))).as("__cents"))
    val asn = q.crossJoin(broadcast(centArr))
      .select(col("__id"), col("__qv"),
        NearestCentroid.nearest(spark, col("__qv"), col("__cents")).as("cid"))
    val upd = asn.select(col("cid"), posexplode(col("__qv")).as(Seq("__pos", "__q")))
      .groupBy(col("cid"), col("__pos"))
      .agg(sum(col("__q")).as("s"), count(lit(1)).as("c"))
    val p = upd.queryExecution.explainString(FormattedMode)
    assert(p.contains("quantize_vec") && p.contains("nearest_centroid"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastNestedLoopJoin")) // 1-row centroid array side
    // partial + final hash aggregation around the single shuffle
    val aggs = p.linesIterator.count(_.trim.matches("""\(\d+\) HashAggregate.*"""))
    assert(aggs >= 2, p)
    // the keyed shuffle is on (cid, __pos); the only other legal
    // exchange is the broadcast of the k-row centroid array — NOTHING
    // may shuffle the corpus by row id (details section carries the
    // partitioning arguments in FormattedMode)
    assert(p.contains("hashpartitioning(cid"), p)
    assert(!p.contains("hashpartitioning(__id"), p)
  }

  test("x_asof_salted: the data-bearing wide stages key on (key, time-bucket)") {
    // the salt must actually reach the shuffle: an exchange keyed on
    // the bare key would re-create the hot-key straggler. The only
    // bare-__k window allowed is the carry-in summary (one row per
    // (key, bucket) after partial aggregation).
    val p = plan("x_asof_salted")
    assert("""hashpartitioning\(__k#\d+L?, __b#\d+L""".r.findFirstIn(p).isDefined,
      s"no (key, bucket) shuffle in the salted plan:\n$p")
  }

  test("x_knn_join: broadcast candidates, bounded TopK buffers through the shuffle") {
    val p = plan("x_knn_join")
    // query side broadcasts — corpus never shuffles for the join
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // TypedImperativeAggregate runs as ObjectHashAggregate with a
    // partial stage below the exchange and a final one above: the
    // shuffle carries k-element heaps, not the corpus x queries stream
    val objAggs = p.linesIterator.count(_.trim.matches("""\(\d+\) ObjectHashAggregate"""))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    // no shuffle exchange may carry an embedding (candidate vectors
    // exist only inside the narrow codegen segment)
    val lines = p.linesIterator.toVector
    val shuffleInputs = lines.zipWithIndex.collect {
      case (l, i) if l.trim.matches("""\(\d+\) Exchange""") =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
    }
    assert(!shuffleInputs.exists(s => s.contains("embedding#") || s.contains("__qvec#")),
      s"an exchange carries vectors:\n$p")
  }

  test("x_boilerplate/x_chunk_scrub: no shuffle exchange carries the chunk string") {
    // round-4 verdict item 1: the chunk-dedup family keys every
    // counting shuffle on the 64-bit FNV hash — the raw chunk column
    // must never cross a shuffle Exchange (its payload would grow with
    // text volume, not doc count). Broadcast exchanges are exempt:
    // x_boilerplate's final report exemplar is ≥minDocs-filtered and
    // report-sized by construction.
    for (n <- Seq("x_boilerplate", "x_chunk_scrub")) {
      val p = plan(n)
      val lines = p.linesIterator.toVector
      val shuffleInputs = lines.zipWithIndex.collect {
        case (l, i) if l.trim.matches("""\(\d+\) Exchange""") =>
          lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
      assert(shuffleInputs.nonEmpty, s"expected shuffle exchanges in $n:\n$p")
      assert(!shuffleInputs.exists(_.contains("chunk#")),
        s"a shuffle exchange carries the chunk string in $n:\n$p")
    }
  }

  test("runtime bloom filter: a selective dim filter gates the fact scan of a shuffle join") {
    // the third leg of the scale-join toolkit next to broadcast + DPP:
    // when the dim side is filtered but the join must shuffle (fact too
    // big to broadcast the dim, not partitioned for DPP), Spark's
    // InjectRuntimeFilter plants a bloom of the dim keys on the fact
    // side, so most fact rows die at the scan instead of crossing the
    // exchange. Thresholds are tuned down only because the fixture is
    // tiny; at 100 TB the defaults (10 GB application side) fire on
    // their own.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_totalprice") > 400000.0) // selective dim filter
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val p = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.toLowerCase.contains("bloomfilter"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // and the probe lands on the fact (lineitem) scan's filter stage
      val probeLine = p.linesIterator.find(_.toLowerCase.contains("might_contain"))
      assert(probeLine.exists(_.contains("l_orderkey")), p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew asymmetry: the skewed JOIN shuffle splits at runtime, the WINDOW shuffle cannot") {
    // the executable basis for ScaleJoins.skewStrategy: Spark's
    // OptimizeSkewedJoin rewrites join shuffle reads only, so an
    // equi-join tolerates moderate skew for free, while a
    // window-partitioned operator (the as-of family) must pre-salt —
    // AQE cannot split a partitionBy(key) without breaking semantics
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one key holds ~83% of the rows, with an incompressible-ish
      // payload so its shuffle partition crosses the skew threshold
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, lit(0L)).otherwise(col("id") % 50 + 1).as("k"),
        repeat(md5(col("id").cast("string")), 8).as("pay"))
      val right = spark.range(0, 51).select(col("id").as("k"), lit("r").as("rv"))
      val jq = left.join(right, "k").agg(sum(length(col("pay"))).as("s"))
      jq.collect()
      val jp = jq.queryExecution.executedPlan.toString
      assert(jp.contains("skewed"), s"AQE did not split the skewed join:\n$jp")
      // same skewed shuffle feeding a window: no split is possible —
      // every row of key 0 must reach one task
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("pay")
      val wq = left.withColumn("rn", row_number().over(w)).agg(sum(col("rn")).as("s"))
      wq.collect()
      val wp = wq.queryExecution.executedPlan.toString
      assert(wp.contains("Window"), wp)
      assert(!wp.contains("skewed"), s"a window shuffle can never skew-split:\n$wp")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compacted partitioned copy still partition-prunes") {
    // the round-5 compactor flattened hive layouts, killing pruning on
    // the compacted copy — lock the fix: a lang predicate over the
    // compacted dir must land in PartitionFilters (directory-level
    // skip), not in PushedFilters (row-group-level skip)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val frag = java.nio.file.Files.createTempDirectory("graft_planfrag").toString
    val comp = java.nio.file.Files.createTempDirectory("graft_plancomp").toString + "/out"
    docs.repartition(8).write.mode("overwrite").partitionBy("lang").parquet(frag)
    graft.sources.Compaction.compactParquet(spark, frag, comp, targetBytes = 1L << 20)
    val q = graft.sources.Compaction.read(spark, comp).filter(col("lang") === "en")
    val p = q.queryExecution.explainString(FormattedMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"scan does not prune on lang:\n$p")
    assert(q.count() == docs.filter(col("lang") === "en").count())
  }

  test("x_unpivot: Expand node, no join, no extra shuffle") {
    val p = plan("x_unpivot")
    assert(p.contains("Expand"), p)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 1, s"unpivot is narrow:\n$p")
  }

  test("x_pq_topk: encode+ADC is one narrow pass — zero exchanges, TakeOrdered") {
    // the PQ codebook and the query's ADC table ride as literals, so
    // the whole search is scan → project → TakeOrderedAndProject; an
    // Exchange anywhere means the corpus moved for a map-shaped step
    val p = plan("x_pq_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange.*""")),
      s"PQ search must not shuffle the corpus:\n$p")
  }

  test("x_source_cap: the shuffle carries TopK heaps, not per-group row streams") {
    // the per-group cap must aggregate (partial heaps map-side), never
    // window-sort the corpus: ObjectHashAggregate with the graft_top_k
    // partial on the map side, and no Window node anywhere
    val p = plan("x_source_cap")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("graft_top_k"), p)
    assert(!p.contains("Window"), s"cap must not window-sort the corpus:\n$p")
  }

  test("x_temperature_mix: rate table broadcasts; the corpus never wide-shuffles") {
    // the only exchanges allowed are the tiny per-stratum aggregation
    // (count partials) and broadcasts — the corpus side must reach its
    // filter through a BroadcastHashJoin
    val p = plan("x_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"rate-table join must broadcast:\n$p")
  }

  test("x_profile: one scan, partial aggs; stack pivot adds no exchange") {
    val p = plan("x_profile")
    // exactly one parquet scan feeds the whole report (FormattedMode
    // prints each scan once in the tree and once in the detail section)
    assert(p.linesIterator.count(l =>
      l.trim.matches("""\(\d+\) Scan parquet\s*""")) == 1, p)
    assert(p.contains("partial"), "per-column aggregates must partial-aggregate map-side")
    // the stack generator runs on the single agg row — no exchange after
    // the final aggregate beyond the 1-row plan tail
    assert(p.contains("Generate"), p)
  }

  test("x_cdc_merge: base is anti-joined, never aggregated or windowed") {
    val p = plan("x_cdc_merge")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("Window"), s"CDC merge must not window the base:\n$p")
    // the only aggregate is the batch's latest-wins max_by (planned as
    // a sort aggregate over the struct payload)
    assert(p.contains("max_by"), p)
  }

  test("x_countmin: corpus shuffles only word-count partials; sketch math is vocab-sized") {
    val p = plan("x_countmin")
    assert(p.contains("partial_count") || p.contains("partial"), p)
    // the bucket expansion (Generate) must sit ABOVE the word-count
    // aggregate — the corpus itself is never exploded d ways
    val gen = p.linesIterator.indexWhere(_.contains("Generate"))
    assert(gen >= 0, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("x_hll: registers collapse map-side; sketch shuffle is constant-size") {
    val p = plan("x_hll")
    // partial_max over (source, bucket) BEFORE the exchange: every map
    // task emits at most |sources|·512 register rows, so the
    // distinct-count shuffle is constant in the corpus size
    assert(p.contains("partial_max"), p)
    // hll_register is a native codegen projection, not a UDF
    assert(p.contains("hll_register"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the est-vs-exact comparison join broadcasts (both sides tiny)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x_range_join: chunked EQUI join — never a nested-loop theta join") {
    val p = plan("x_range_join")
    assert(p.contains("HashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"point-in-range must not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_zorder: one narrow codegen pass — no exchange except the output sort") {
    val p = plan("x_zorder")
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    // the only exchange is the output sort's range partitioning — the
    // zorder2 projection itself is narrow over the scan
    assert(p.linesIterator.count(l =>
      l.trim.matches("""\(\d+\) Exchange\s*""")) == 1, p)
  }

  test("x_ivm: delta aggregates partially; no rescan-shaped extra exchanges") {
    val p = plan("x_ivm")
    assert(p.contains("FullOuter"), p)
    assert(p.contains("partial"), "delta agg must partial-aggregate map-side")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("x_funnel: step filter pushed to scan, chain fold is HOF — no Window, no self-joins") {
    val p = plan("x_funnel")
    // the naive funnel is k-1 self-joins or a window scan; ours is one
    // user-key aggregate + an array fold inside project
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("PushedFilters"))
    assert(p.linesIterator.exists(l => l.contains("In(event_type") ||
      l.contains("In(event_type,")), p)
  }

  test("x_copurchase: pair counts partial-agg, top-20 is TakeOrdered, no join") {
    val p = plan("x_copurchase")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
    // pair expansion is a narrow generate over basket arrays, not the
    // naive lineitem self-join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate") && p.contains("explode(flatten(transform"), p)
  }

  test("x_editdist_join/x_triangles: blocked equi-joins only, never a cartesian") {
    val pe = plan("x_editdist_join")
    assert(!pe.contains("CartesianProduct") && !pe.contains("BroadcastNestedLoop"), pe)
    val pt = plan("x_triangles")
    // (the 1-row totals crossJoins plan as BNLJ over single rows; the
    // data-sized wedge/closure joins must be hash/merge equi-joins)
    assert(!pt.contains("CartesianProduct"), pt)
    // x_local_clustering returns an eager localCheckpoint (caches are
    // released on return — the x_bigram_nll materialization contract):
    // the returned plan must be a local frame, never one that
    // re-derives the wedge join per consumer
    val pl = plan("x_local_clustering")
    assert(!pl.contains("Scan parquet") && !pl.contains("CartesianProduct"), pl)
  }

  test("x_scd2: both windows share one exchange and one sort") {
    val p = plan("x_scd2")
    // lag (no-op drop) and lead (interval close) partition+order the
    // same way; the filter between them preserves both, so the plan
    // must hold exactly one shuffle and one sort for the two Window ops
    // 2 exchanges total: the window hash shuffle + the output orderBy's
    // range partitioning; 2 sorts: the shared window sort + the output
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Window\s*""")) == 2, p)
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange\s*""")) == 2, p)
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Sort\s*""")) == 2, p)
  }

  test("x_bm25: df/stats broadcast back; top-k is TakeOrdered; aggs partial") {
    val p = plan("x_bm25")
    // the tiny df table and the 1-row stats row must come back as
    // broadcasts — the match-set side never sort-merge-joins
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), "1-row stats must BNLJ") // cross of stats
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(p.contains("partial"), "tf/dl aggs must partial-aggregate map-side")
  }

  test("x_inverted: postings digest never shuffles arrays for the df join") {
    val p = plan("x_inverted")
    // df is an agg OF the posting set — it must broadcast back to the
    // posting rows, not force a second corpus-wide sort-merge join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x_ols/x_corr_matrix: one partial-agged pass, no window, no join") {
    for (q <- Seq("x_ols", "x_corr_matrix")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), p)
      assert(p.contains("partial_regr_slope") || p.contains("partial_corr"),
        s"$q: aggregates must partial-agg map-side")
      assert(!p.contains("Window"), s"$q must not window")
      assert(!p.contains("Join"), s"$q is a single-pass aggregation")
    }
  }

  test("x_ks_test/x_eqdepth: materialized small results; the CDF window partitions on the bucket id") {
    // round 11: these statistics materialize EAGERLY (1-row / ≤bins-row
    // outputs — the quantile-family contract below), so the returned
    // plan must be a literal/materialized scan with no corpus re-scan
    for (q <- Seq("x_ks_test", "x_eqdepth")) {
      val p = plan(q)
      assert(!p.contains("Scan parquet"), s"$q\n$p")
      assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
        s"$q\n$p")
    }
    // the bucket-partitioned-window property now lives INSIDE the eager
    // call: pin it on the equivalent lazy construction — ntileLead's
    // rank/lead pass is the same fine-cell machinery and stays lazy
    // (corpus-sized output), so its plan shows the in-bucket window
    // partitioned on __b with the offsets re-entering via broadcast
    val p = plan("x_ntile_lead")
    val winSpecs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.nonEmpty, p)
    assert(winSpecs.forall(_.matches(""".*\], \[__b#\d+\], \[.*""")),
      "every data-side window must partition on the bucket id\n" +
        winSpecs.mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_sorted_neighborhood: block-keyed window + lead, no self-join on data") {
    val p = plan("x_sorted_neighborhood")
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // pairs come from lead(), not a join: no join node at all
    assert(!p.linesIterator.exists(l => l.contains("Join")), p)
  }

  test("x_markov: lag window shuffles once on the entity key; normalizer broadcasts") {
    val p = plan("x_markov")
    assert(p.contains("Window"), p)
    assert(p.contains("partial_count"), "pair counts must partial-agg")
    assert(p.contains("BroadcastHashJoin"), "per-from totals must broadcast back")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_ewma: fold in one hash-agg pass — no window, no join") {
    val p = plan("x_ewma")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "collect_list needs an object/sort aggregate\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.linesIterator.exists(_.contains("Join")), p)
  }

  test("x_dq_rules: row rules share ONE scan; FK anti-join broadcasts") {
    val p = plan("x_dq_rules")
    // 4 row predicates must NOT mean 4 scans: the whole report's scan
    // budget is rowRules(1) + unique(2) + fk anti-join(1) + fk
    // total(1, column-pruned to zero fields) + customer(1) — counted
    // on the detail-block headers so tree + detail don't double-count
    val scans = p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet.*"""))
    assert(scans <= 6, s"expected <= 6 scans (one per rule family leg), got $scans\n" + p)
    assert(p.contains("BroadcastHashJoin LeftAnti"), "FK check must broadcast the parent")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_linkage: blocked candidates only — no cartesian, top-50 is TakeOrdered") {
    val p = plan("x_linkage")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), "sorted-neighborhood blocking must drive candidates")
  }

  test("x_autocorr: one partial-agged raw scan; materialized stats ops scan raw data once") {
    // x_autocorr is the lazy single-chain representative of the
    // time-series family — its plan is lockable end-to-end.
    val p = plan("x_autocorr")
    assert(p.contains("partial_"), "the raw pass must partial-agg\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val scans = p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet.*"""))
    assert(scans <= 1, s"expected 1 raw scan, got $scans")
    // x_cusum / x_season / x_psi return MATERIALIZED results (their
    // series table feeds two branches, so they persist it, run once,
    // and release the cache — Spark has no subplan sharing); the
    // single-raw-scan property is therefore structural, and the
    // returned plan is a LogicalRDD/LocalTableScan with nothing left
    // to lock. Assert exactly that, so a regression back to a lazy
    // double-scan plan (Scan parquet reappearing) is caught.
    for (q <- Seq("x_cusum", "x_season", "x_psi")) {
      val pm = plan(q)
      assert(!pm.contains("Scan parquet"),
        s"$q must return a materialized result, not re-derive raw scans\n" + pm)
    }
  }

  test("x_jl_distortion: native projection in the plan, no cartesian") {
    val p = plan("x_jl_distortion")
    // the JL reduction must run as the codegen expression, not an
    // interpreted HOF chain, and the pair probe is an equi-join
    assert(p.contains("random_projection"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quantile family: planning-sized literal results, no raw re-scan") {
    // the family is EAGER (the x_bigram_nll / x_pca_power
    // materialization contract): the CDF machinery runs ONCE at call
    // time over a persisted distinct-value frame, the probe result
    // (|ps|·|groups| rows, planning-sized by construction) collects,
    // and consumers embed a LITERAL — an action on the returned frame
    // must never re-derive the corpus scans (the probe internals are
    // themselves broadcast joins over the cached CDF, never a global
    // sort — spec-checked via the exact-==-percentile parity suite)
    for (q <- Seq("x_exact_quantiles", "x_grouped_quantiles",
        "x_interp_quantiles")) {
      val p = plan(q)
      assert(!p.contains("Scan parquet"), s"$q\n$p")
      assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
        s"$q\n$p")
    }
  }

  test("x_budget_select: offsets broadcast, no data-bearing global sort") {
    val p = plan("x_budget_select")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the per-bucket window sorts within hash partitions; only the
    // tiny per-source output orderBy may range-exchange
    val rangeExchanges = p.linesIterator
      .count(_.contains("Exchange rangepartitioning"))
    assert(rangeExchanges <= 1, s"global sort crept in\n$p")
  }

  test("x_bigram_nll: returns a materialized result, no raw re-scan") {
    // the operator persists the token/bigram frames (counts AND
    // scoring consume them) and hands back an eager localCheckpoint so
    // the caches can be released — the returned plan must be a local
    // frame, never one that re-derives the corpus scans per consumer
    // (the x_cusum-family materialization contract)
    val p = plan("x_bigram_nll")
    assert(!p.contains("Scan parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_pca_power/x_label_prop: results are planning-sized, no raw re-scan") {
    // both operators materialize through their iterative/moment pass;
    // the returned plan must be a local/checkpointed frame (plus tiny
    // shaping), never a plan that re-derives corpus scans at action
    // time — re-running the power iteration or the LPA rounds per
    // consumer would be the regression this catches
    val pca = plan("x_pca_power")
    assert(!pca.contains("Scan parquet"), pca)
    val lp = plan("x_label_prop")
    assert(!lp.contains("Scan parquet"), lp)
  }

  test("x_kn_bigram/x_dsir_select: materialized results, model joins never cartesian") {
    // both scorers share the bigramFrames substrate and return eager
    // localCheckpoints (multiple count aggs consume the persisted
    // frames; the returned plan must not re-derive the corpus scans)
    val kn = plan("x_kn_bigram")
    assert(!kn.contains("Scan parquet"), kn)
    val ds = plan("x_dsir_select")
    assert(!ds.contains("Scan parquet"), ds)
    assert(!ds.contains("CartesianProduct"), ds)
  }

  test("x_sq_recall: one narrow quantized scan, top-k is TakeOrdered, no SMJ") {
    // scales and query codes are literals, so the quantized ranking is
    // scan -> project -> TakeOrderedAndProject; the recall join is over
    // two <=k-row lists and must broadcast
    val p = plan("x_sq_recall")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_zone_map: one partial-agged pass, bounds broadcast back, no window") {
    // the zone-map audit is a single hash aggregation over the
    // z-projected frame; the (min,max) bounds ride as a broadcast
    // 1-row aggregate — never a sort-merge join or a window
    val p = plan("x_zone_map")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), "zone-map agg must combine map-side")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("x_rrf_fusion: fusion is planning-sized — corpus work confined to the producers") {
    // BM25 stats/df broadcast (the x_bm25 lock), the dense list is the
    // x_ann_topk shape; the fusion itself is union + hash agg over two
    // <=50-row ranked lists — no join of any kind in the fusion layer
    // (a full-outer formulation would sort-merge: Spark cannot
    // broadcast full outer)
    val p = plan("x_rrf_fusion")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x_ntile_lead: partitioned windows only — the global rank/lead runs per bucket") {
    val p = plan("x_ntile_lead")
    // the rank and lead windows must be PARTITIONED (by the prefix-sum
    // bucket) — the naive NTILE/LEAD form moved the whole table through
    // one task; the boundary exchange is a broadcast of the fold frame
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x_sketch_quantiles: sketches merge map-side — one keyed shuffle, no window/sort-join") {
    val p = plan("x_sketch_quantiles")
    // the whole point of the mergeable sketch: a partial
    // ObjectHashAggregate BELOW the exchange and a final one above, so
    // the shuffle carries O(k log n) sketch buffers per (group,
    // partition) — never the values. A plan that lost the partial
    // stage would shuffle the corpus to the reducers and silently
    // reintroduce the buffer-everything percentile shape.
    val objAggs = p.linesIterator.count(_.trim.matches("""\(\d+\) ObjectHashAggregate"""))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    // exchanges: the keyed agg shuffle + the output ORDER BY range
    // exchange only — no join, no window, nothing corpus-wide
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"expected <= 2 exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains(" Window"), p)
  }

  test("x_sketch_weighted: same partial+final sketch-agg shape, no window/sort-join") {
    val p = plan("x_sketch_weighted")
    val objAggs = p.linesIterator.count(_.trim.matches("""\(\d+\) ObjectHashAggregate"""))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"expected <= 2 exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains(" Window"), p)
  }

  test("x_sketch_rollup: horizon fold reads ONLY the selected month partitions") {
    // the roll-up's whole scale claim — "fold any horizon without
    // rescanning history" — is the partition pruning on the sketch
    // store: the merge job's scan must carry the mon bounds as
    // PartitionFilters (pruned at planning, zero files outside the
    // horizon opened), not as a post-scan Filter over all of history.
    val p = plan("x_sketch_rollup")
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, s"no PartitionFilters line:\n$p")
    assert(pf.get.contains("mon") && pf.get.contains("1995-01")
      && pf.get.contains("1995-12"), pf.get)
    // and the fold itself keeps the mergeable-sketch agg shape
    val objAggs = p.linesIterator.count(_.trim.matches("""\(\d+\) ObjectHashAggregate"""))
    assert(objAggs >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains(" Window"), p)
  }

  test("no unpartitioned window over an unbounded input anywhere in SparkEntry.queries") {
    // the round-10 scale audit: a Window with an EMPTY partitionSpec
    // serializes its entire input through ONE task — acceptable only
    // when that input is provably bounded (a Limit below it: top-k
    // lists, probe tables) or is a DOCUMENTED oracle-form exception.
    // This walks every declared query's optimized logical plan, so a
    // future query (or operator rewrite) reintroducing a corpus-sized
    // single-partition window fails here by name.
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LWindow}
    // x_seq_pack (and its exact-BPE-count twin x_seq_pack_bpe) is the
    // packBins GLOBAL-ORDER form — deterministic by construction and
    // kept AS the oracle form (Sampling.packBins scaladoc); its scale
    // path (shardCols => parallel keyed windows) is spec-locked in
    // OperatorsSpec. x_curation_funnel's packing stage is the same
    // global-order packBins call (same documented exception), and its
    // window input is further bounded by the three preceding funnel
    // stages
    val documented = Set("x_seq_pack", "x_seq_pack_bpe", "x_curation_funnel")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => documented.contains(name) }
      .flatMap { case (name, fn) =>
        val lp = fn(spark, sfDir).queryExecution.optimizedPlan
        val bad = lp.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case _: GlobalLimit => (); case _: LocalLimit => ()
            }.isEmpty => w
        }
        if (bad.nonEmpty) Some(s"$name (${bad.size} unpartitioned window(s))")
        else None
      }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded inputs:\n${offenders.mkString("\n")}")
  }

  test("bootstrap fan-out: ONE explicit non-coalescible key exchange feeds the fused sentinel") {
    // the round-15 4x regression, locked out: the bootstrap family's
    // fused key-uniqueness sentinel must ride an EXPLICIT
    // repartition(n, __k) — a bare groupBy exchange is AQE-coalescible,
    // the narrow keyed rows are a few MB, and the coalesced
    // 1-partition (B+1)x explode measured 4x wall on the sf0.1 sweep.
    // REPARTITION_BY_NUM is the non-coalescible shuffle origin; the
    // sentinel aggregation must REUSE that exchange (exactly one in
    // the plan), not add its own.
    import org.apache.spark.sql.functions._
    val base = spark.range(1, 1000)
      .select(col("id").cast("double").cast("decimal(18,6)").as("v"),
        lit(0L).as("nf"), col("id").as("__k"))
    val src = graft.operators.Stats.uniqueKeyedFanout(base, "plan-lock")
    val p = src.queryExecution.explainString(FormattedMode)
    assert(p.contains("REPARTITION_BY_NUM"),
      s"fan-out exchange lost its explicit (non-coalescible) origin:\n$p")
    // FormattedMode prints each node twice (tree + detail section) —
    // count the numbered detail headers, one per physical node
    val exchanges = p.linesIterator
      .count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1,
      s"expected exactly ONE exchange (the key repartition, reused by " +
        s"the sentinel agg) — found $exchanges:\n$p")
    // the duplicate guard is in-plan, not a separate driver action
    assert(p.contains("raise_error"), p)
  }
}
