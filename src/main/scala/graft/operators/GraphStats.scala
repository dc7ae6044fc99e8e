package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics — the shape numbers a graph pipeline
  * reads before choosing algorithms and partitioning (is this graph
  * assortative like a citation network or disassortative like a
  * web/bipartite crawl? how heavy is the degree tail the skew
  * protocol must expect?).
  */
object GraphStats {

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * the degrees at the two ends of an edge, over the symmetrized
    * simple graph. r > 0 — hubs prefer hubs (social/citation);
    * r < 0 — hubs attach to leaves (web graphs, and structurally
    * forced for bipartite buyer↔supplier shapes). One row out:
    * `(n_nodes, n_edges, r)` with n_edges counting undirected edges
    * once.
    *
    * Scale shape: degree table = one partial-agged hash agg over the
    * symmetrized |E| frame; both endpoint joins key on the node id
    * (AQE broadcasts the |V|-row degree side when small); the Pearson
    * r comes from EXACT DECIMAL raw moments (degrees are integers, so
    * every Σ is order-independent — no co-moment merge-order ulp
    * surface, and no ANSI divide-by-zero inside the `corr` aggregate:
    * a degree-regular graph has zero variance and yields r = NULL by
    * the guard, not an error) — one aggregation pass, two IEEE sqrt
    * and one division at the very end, rounded to 4.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = raw
      .unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val da = col("da").cast("decimal(18,0)")
    val db = col("db").cast("decimal(18,0)")
    val moments = sym
      .join(deg.select(col("node").as("src"), col("deg").as("da")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("db")), Seq("dst"))
      .agg(
        count_distinct(col("src")).as("n_nodes"),
        count(lit(1)).cast("decimal(18,0)").as("cnt"),
        sum(da).as("sa"), sum(db).as("sb"),
        sum(da * db).as("sab"),
        sum(da * da).as("saa"),
        sum(db * db).as("sbb"))
    val num = col("cnt") * col("sab") - col("sa") * col("sb")
    val dena = col("cnt") * col("saa") - col("sa") * col("sa")
    val denb = col("cnt") * col("sbb") - col("sb") * col("sb")
    val out = moments.select(
        col("n_nodes"),
        (col("cnt") / 2).cast("long").as("n_edges"),
        when(dena > 0 && denb > 0,
          round(num.cast("double") /
            (sqrt(dena.cast("double")) * sqrt(denb.cast("double"))), 4))
          .as("r"))
      .localCheckpoint(true)
    sym.unpersist()
    out
  }
}
