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
  * than a per-round driver fold. Each round ends with ONE tiny driver
  * action — a |V|-keyed join of the new and previous hub frames
  * aggregated to max|Δh| — which (a) materializes the round's lazily-
  * cut chain so the round's raw half-round frames can be released
  * IMMEDIATELY (at most the current round's TWO raw |V|-row frames
  * are ever cached, where the round-9 form buffered all 2·iters of
  * them to the end), and (b) doubles as the CONVERGENCE CERTIFICATE:
  * [[scoresConverged]] with `earlyStop` skips the remaining rounds
  * once max|Δh| ≤ `tol` (default 0.0 — a PROVEN fixpoint, so skipped
  * rounds are exact no-ops and the output is identical to running
  * them). Vertex frames broadcast below `maxBroadcastNodes`, rounds
  * cut with the shared [[RoundCheckpointer]]. Nodes nothing points at
  * hold authority 0; pure sinks hold hub 0 — both kept (left join,
  * coalesce), since "this node has no hub role" is signal, not
  * absence. Returns `(node, hub, auth)` unrounded; callers round for
  * cross-engine comparison (only per-sum float order differs).
  */
object Hits {

  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             iters: Int = 3,
             maxBroadcastNodes: Long = 10_000_000L): DataFrame =
    scoresConverged(edges, srcCol, dstCol, iters, earlyStop = false,
      maxBroadcastNodes = maxBroadcastNodes)._1

  /** [[scores]] plus the convergence certificate `(result, roundsRun,
    * converged)`: the per-round max|Δh| aggregate every round already
    * pays (it is the round's materializing action) is compared against
    * `tol`; with `earlyStop` a round whose certificate passes is the
    * LAST round run ([[KCore.kCoreConverged]]'s contract — the check
    * runs on the final round too, so a fixpoint reached exactly at the
    * cap still certifies). At the default `tol = 0.0` the fixpoint is
    * exact, so early-stopped output is bit-identical to the uncapped
    * run. */
  def scoresConverged(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int = 3, earlyStop: Boolean = false,
                      tol: Double = 0.0,
                      maxBroadcastNodes: Long = 10_000_000L)
      : (DataFrame, Int, Boolean) = {
    require(iters >= 1, "hits: iters must be >= 1")
    require(tol >= 0.0, "hits: tol must be >= 0")
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
    // the CURRENT round's raw half-round frames: persisted because each
    // feeds both its max-aggregate branch and the normalize join;
    // released as soon as the NEXT certificate action has materialized
    // the frames derived from them — never more than these two live
    var liveRaws: Seq[DataFrame] = Nil
    var r = 0
    var converged = false
    while (r < iters && !(earlyStop && converged)) {
      // the previous round's certificate action materialized everything
      // derived from its raws — release them BEFORE persisting this
      // round's pair, so at most two raw frames are ever cached
      liveRaws.foreach(_.unpersist())
      liveRaws = Nil
      // authority half-round: a(v) = Σ h(u) over in-edges, normalized
      // by the broadcast 1-row max
      val aRaw = e
        .join(hint(h.select(col("node").as("src"), col("h"))), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("ar"))
        .persist(lvl)
      // populate before the normalize plan runs: its two consumers (the
      // per-node join and the 1-row max) both ride in as BROADCAST
      // builds, which execute concurrently ahead of the main stages —
      // against an unpopulated cache each recomputes the |E|-keyed
      // half-round join (guide §5; the Dedup/GraphStats discipline)
      aRaw.count()
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
      hRaw.count() // same two-broadcast-consumer discipline as aRaw
      val hPrev = h
      h = ckpt(nodes
        .join(hint(hRaw), Seq("node"), "left")
        .crossJoin(broadcast(hRaw.agg(max(col("hr")).as("mh"))))
        .select(col("node"),
          coalesce(col("hr") / col("mh"), lit(0.0)).as("h")))
      r += 1
      // the round's ONE driver action: max|Δh| over a |V|-keyed join of
      // two cut frames — materializes the whole round chain (so the
      // raws below can go) and is the convergence certificate
      val dh = h
        .join(hPrev.select(col("node"), col("h").as("__h0")), Seq("node"))
        .agg(max(abs(col("h") - col("__h0"))).as("dh"))
        .head().getDouble(0)
      liveRaws = Seq(aRaw, hRaw)
      // the certificate is recorded unconditionally — `earlyStop` only
      // decides whether a passing round is the LAST round run, so a cap
      // run that happens to end exactly at the fixpoint still certifies
      converged = dh <= tol
    }
    val out = h.join(a, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
      .localCheckpoint(true)
    liveRaws.foreach(_.unpersist())
    ckpt.release()
    e.unpersist(); nodes.unpersist()
    (out, r, converged)
  }
}
