package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS over an edge DataFrame — hop distance from a seed
  * set, the neighborhood-expansion primitive behind "pages within k
  * links of a trusted set" corpus filters and blast-radius queries.
  *
  * Pregel-in-DataFrame like [[PageRank]]: the frontier and the visited
  * set are plain DataFrames; one hash join + one anti-join per hop.
  * Per round the frontier joins edges on src (shuffle keyed on the
  * join key, |frontier-adjacent edges| rows), dedups, and anti-joins
  * the visited set so a node keeps its FIRST (minimal) hop count —
  * exactly BFS layering. Rounds are cut with checkpoints (reliable
  * when a cluster checkpoint dir is set, local otherwise) because the
  * visited frame re-enters the next round's plan twice — lineage would
  * double per hop.
  *
  * maxHops bounds both the iteration count and the state: visited
  * never exceeds |V| rows of (node, hop). Nothing quadratic, no
  * all-pairs — the standard scalable BFS shape.
  */
object GraphTraversal {

  /** Hop distance (0-based) from `seeds` for every node reachable
    * within `maxHops` edges: `(node, hops)`, one row per reached node,
    * hops = length of the shortest path. `directed = false` (default)
    * traverses edges both ways.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String,
              maxHops: Int, directed: Boolean = false): DataFrame = {
    require(maxHops >= 0, "bfsHops: maxHops must be >= 0")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val adj = (if (directed) fwd
               else fwd.unionByName(
                 edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
      .distinct().persist(lvl)

    val sc = edges.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

    var visited = ckpt(seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hops", lit(0)))
    var frontier = visited.select(col("node"))
    var h = 0
    while (h < maxHops) {
      h += 1
      val next = frontier.join(adj, frontier("node") === adj("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
      val layer = ckpt(next.withColumn("hops", lit(h)))
      // an empty layer ends the walk — every later layer is empty too
      if (layer.isEmpty) { h = maxHops }
      else {
        visited = ckpt(visited.unionByName(layer))
        frontier = layer.select(col("node"))
      }
    }
    adj.unpersist()
    visited
  }
}
