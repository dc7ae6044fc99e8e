package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PageRank over an edge DataFrame — the graph-centrality quality
  * signal web-corpus pipelines weight documents by (a page linked from
  * many well-linked pages is likelier to be worth training on).
  *
  * Pregel-in-DataFrame: ranks and contributions are plain relational
  * state, one hash-join + one partially-aggregated SUM per iteration —
  * no vertex-program framework needed. Per iteration:
  *
  *   r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  D/N )
  *
  * where D is the total rank mass sitting on dangling nodes (no
  * out-edges) — a 1-row broadcast aggregate over the materialized rank
  * frame, redistributed uniformly (the standard dangling-node fix).
  *
  * Scale shape: each iteration shuffles |E| contribution rows keyed on
  * dst plus |V| rank rows — never materializing anything quadratic.
  * Like the connected-components dedup, every round is cut through a
  * checkpoint: the rank frame appears in several places in the next
  * round's plan, so a lazy lineage doubles per iteration (2^n plan
  * blowup); with a cluster checkpoint dir configured the reliable
  * path survives executor loss, local runs take localCheckpoint.
  */
object PageRank {

  /** Ranks after `iters` rounds: `(node, r)` with Σ r = 1. Multi-edges
    * count multiplicity (dedup edges first for simple-graph behavior);
    * `srcCol`/`dstCol` must be the same type.
    *
    * Vertex-state joins are broadcast when the graph is small enough:
    * checkpointed frames carry NO size statistics (LogicalRDD defaults
    * to "huge"), so without the explicit hint every iteration
    * sort-merge-joins |E| edge rows against a |V|-row rank frame —
    * measured 4 s/iteration on a 16k-node graph that broadcasts in
    * well under 1 s. |V| is counted ONCE (the count doubles as the N
    * constant, which the rank formula needs anyway) and the hint
    * applies below `maxBroadcastNodes`; above it the joins stay
    * shuffled, which is the correct plan for a web-scale graph. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 5, damping: Double = 0.85,
            maxBroadcastNodes: Long = 10_000_000L): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    require(damping > 0 && damping < 1, s"pageRank: damping $damping outside (0,1)")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(lvl)
    val nNodes = nodes.count() // one action: N constant + broadcast decision
    val small = nNodes <= maxBroadcastNodes
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("od"))
      .persist(lvl)

    val sc = edges.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    var prevCached: Option[DataFrame] = None
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) {
        df.persist(lvl)
        val out = df.checkpoint(true)
        prevCached.foreach(_.unpersist())
        prevCached = Some(df)
        out
      } else df.localCheckpoint(true)

    var r = ckpt(nodes.select(col("node"), lit(1.0 / nNodes).as("r")))
    for (_ <- 1 to iters) {
      // Σ_{u→v} r(u)/outdeg(u), keyed on dst — partial agg map-side;
      // rank and degree frames are |V|-sized → broadcast when small
      val contrib = e
        .join(hint(r.select(col("node").as("src"), col("r"))), Seq("src"))
        .join(hint(deg), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("od")).as("c"))
      // dangling mass D: rank sitting on nodes with no out-edges
      val dang = broadcast(
        r.join(hint(deg), r("node") === deg("src"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0.0)).as("dm")))
      r = ckpt(nodes
        .join(hint(contrib), Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit((1.0 - damping) / nNodes) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dm") / nNodes)).as("r")))
    }
    prevCached.foreach(_.unpersist())
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    r
  }

  /** Ranks scaled so 1.0 = the uniform rank (rank·N): the relative
    * centrality score a corpus-weighting pipeline joins back on.
    * N = the rank frame's own row count (one row per node, already
    * checkpointed) — no second distinct-union pass over the edges. */
  def relativeRanks(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val r = ranks(edges, srcCol, dstCol, iters, damping)
    val n = r.count().toDouble
    r.select(col("node"), (col("r") * n).as("rel_rank"))
  }
}
