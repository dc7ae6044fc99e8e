package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) — the link-analysis
  * signal [[PageRank]] cannot express on DIRECTED bipartite-ish
  * graphs: an authority is a node good sources point AT, a hub is a
  * node that points at good authorities, and the two scores reinforce
  * mutually (a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v)). On a
  * buyer→supplier or query→document graph the split is exactly the
  * two roles PageRank conflates.
  *
  * Normalization is BY THE MAXIMUM each half-round (scores land in
  * [0, 1] with the top hub/authority pinned at exactly 1.0) rather
  * than the textbook L2 norm: the max of a column is deterministic
  * where a parallel sum-of-squares is one more float-order surface,
  * and either choice converges to the same principal-eigenvector
  * DIRECTION — the quantity HITS ranks by.
  *
  * Pregel-in-DataFrame like the rest of the link-analysis family:
  * each half-round is one |E|-keyed join + one partial-agged SUM, and
  * the 1-row max rides as a BROADCAST aggregate (crossJoin) rather
  * than a per-round driver fold — unlike PageRank's dangling mass the
  * max never feeds a driver-side literal, so the loop runs ZERO
  * driver actions and the caller's single action materializes the
  * whole lazily-marked round chain (each raw half-round frame is
  * persisted because it feeds both its max and the normalize join).
  * Vertex frames broadcast below `maxBroadcastNodes`, rounds cut with
  * the shared [[RoundCheckpointer]]. Nodes nothing points at hold
  * authority 0; pure sinks hold hub 0 — both kept (left join,
  * coalesce), since "this node has no hub role" is signal, not
  * absence. Returns `(node, hub, auth)` unrounded; callers round for
  * cross-engine comparison (only per-sum float order differs).
  */
object Hits {

  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             iters: Int = 3,
             maxBroadcastNodes: Long = 10_000_000L): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(lvl)
    val nNodes = nodes.count() // one action: emptiness + broadcast decision
    require(nNodes > 0, "hits: empty edge set — no scores to compute")
    val small = nNodes <= maxBroadcastNodes
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val ckpt = new RoundCheckpointer(
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined)

    var h = ckpt(nodes.select(col("node"), lit(1.0).as("h")))
    var a: DataFrame = null
    // raw half-round frames stay cached until the final action has
    // materialized the whole lazy chain (an early unpersist would
    // recompute the |E| join feeding both the max and the normalize)
    val raws = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      // authority half-round: a(v) = Σ h(u) over in-edges, normalized
      // by the broadcast 1-row max
      val aRaw = e
        .join(hint(h.select(col("node").as("src"), col("h"))), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("ar"))
        .persist(lvl)
      raws += aRaw
      a = ckpt(nodes
        .join(hint(aRaw), Seq("node"), "left")
        .crossJoin(broadcast(aRaw.agg(max(col("ar")).as("ma"))))
        .select(col("node"),
          coalesce(col("ar") / col("ma"), lit(0.0)).as("a")))
      // hub half-round: h(u) = Σ a(v) over out-edges, max-normalized
      val hRaw = e
        .join(hint(a.select(col("node").as("dst"), col("a"))), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("hr"))
        .persist(lvl)
      raws += hRaw
      h = ckpt(nodes
        .join(hint(hRaw), Seq("node"), "left")
        .crossJoin(broadcast(hRaw.agg(max(col("hr")).as("mh"))))
        .select(col("node"),
          coalesce(col("hr") / col("mh"), lit(0.0)).as("h")))
    }
    val out = h.join(a, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
      .localCheckpoint(true)
    raws.foreach(_.unpersist())
    ckpt.release()
    e.unpersist(); nodes.unpersist()
    out
  }
}
