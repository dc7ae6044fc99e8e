package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basket co-occurrence and triangle counting (SURVEY §2.B graph
  * family, alongside PageRank/connected components): market-basket pair
  * mining and the degree-oriented triangle count every graph-analytics
  * engine ships.
  */
object CoOccurrence {

  /** Distinct unordered item pairs per basket, counted across baskets —
    * the market-basket co-occurrence table (and the edge builder for
    * [[triangleStats]]).
    *
    * Shape at scale: ONE shuffle groups items by basket (collect_set
    * dedups in the partial aggregate), then pair expansion is a narrow
    * higher-order transform over each basket's sorted item array — the
    * quadratic blowup is bounded by basket size (single-digit for order
    * lines), never by table size — and the pair counts partial-agg
    * before their shuffle. The naive self-join form shuffles the full
    * item table twice and re-materializes every basket as join output.
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol).as("b"))
      .agg(sort_array(collect_set(col(itemCol))).as("items"))
    // (items[i], items[j]) for i < j; sorted, so u < v canonically
    val pairs = flatten(transform(col("items"), (x: Column, i: Column) =>
      transform(slice(col("items"), i + 2, size(col("items"))),
        (y: Column) => struct(x.as("u"), y.as("v")))))
    baskets.select(explode(pairs).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Association rules A → B over baskets (the market-basket trio of
    * support / confidence / lift for single-item antecedents): rule
    * quality from nothing but the pair counts [[basketPairs]] already
    * produces, per-item basket counts, and the basket total —
    *
    *   support(A→B)    = |A∧B| / N
    *   confidence(A→B) = |A∧B| / |A|
    *   lift(A→B)       = confidence / (|B| / N)
    *
    * Both directions of each unordered pair are emitted (confidence and
    * lift are asymmetric). All three metrics are ratios of exact
    * integer counts — replayable bit-for-bit cross-engine.
    *
    * Shape at scale: pair counts via the basket-bounded HOF expansion
    * (one shuffle, no self-join of the item table); per-item counts are
    * a second aggregate over the SAME deduped (basket, item) rows; the
    * final joins attach |items|-sized tables to the pair table (AQE
    * broadcasts them when small); the basket total is a 1-row cross
    * join. `minPairCount` prunes the long tail BEFORE the metric math.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 1L): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = basketPairs(bi, "b", "i").filter(col("cnt") >= minPairCount)
    val itemCnt = bi.groupBy(col("i")).agg(count(lit(1)).as("ic"))
    val nBaskets = broadcast(bi.select(col("b")).distinct()
      .agg(count(lit(1)).as("nb")))
    val directed = pairs.select(col("u").as("ante"), col("v").as("cons"), col("cnt"))
      .unionByName(pairs.select(col("v").as("ante"), col("u").as("cons"), col("cnt")))
    val out = directed
      .join(itemCnt.select(col("i").as("ante"), col("ic").as("ca")), Seq("ante"))
      .join(itemCnt.select(col("i").as("cons"), col("ic").as("cc")), Seq("cons"))
      .crossJoin(nBaskets)
      .select(col("ante"), col("cons"), col("cnt"),
        round(col("cnt").cast("double") / col("nb"), 6).as("support"),
        round(col("cnt").cast("double") / col("ca"), 6).as("confidence"),
        round(col("cnt").cast("double") * col("nb") /
          (col("ca") * col("cc")), 6).as("lift"))
    val materialized = out.localCheckpoint(true)
    bi.unpersist()
    materialized
  }

  /** Triangle count + global clustering coefficient over an undirected
    * edge list (`u < v` canonical, distinct).
    *
    * Algorithm: node-iterator with degree orientation — each edge is
    * oriented from its lower-(degree, id) endpoint to the higher, wedges
    * are built by joining oriented edges on their source, and a wedge
    * closes iff its (b, c) endpoints are themselves an oriented edge.
    * Each triangle has exactly one vertex with two outgoing oriented
    * edges, so it is counted exactly once, and the oriented out-degree
    * is O(sqrt(m)) — the classic bound that keeps the wedge join from
    * exploding on high-degree hubs at scale. Two shuffle joins on node
    * keys, no cartesian anywhere.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val byU = edges.join(deg.select(col("n").as("u"), col("d").as("du")), "u")
    val withDeg = byU.join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    // orient low-(deg, id) -> high; rank carried as an orderable struct
    val ru = struct(col("du").as("d"), col("u").as("n"))
    val rv = struct(col("dv").as("d"), col("v").as("n"))
    val o = withDeg.select(
      when(ru < rv, col("u")).otherwise(col("v")).as("a"),
      when(ru < rv, rv).otherwise(ru).as("rb"))
      .select(col("a"), col("rb.n").as("b"), col("rb"))
    val wedges = o.select(col("a"), col("b").as("w1"), col("rb").as("r1"))
      .join(o.select(col("a"), col("b").as("w2"), col("rb").as("r2")), "a")
      .filter(col("r1") < col("r2"))
      .select(col("w1").as("a"), col("w2").as("b"))
    val triangles = wedges.join(o.select(col("a"), col("b")), Seq("a", "b"))
      .agg(count(lit(1)).as("triangles"))
    val totals = edges.agg(count(lit(1)).as("edges"))
      .crossJoin(deg.agg(sum(col("d") * (col("d") - 1) / 2).cast("long").as("wedges")))
    totals.crossJoin(triangles)
      .select(col("edges"), col("triangles"),
        round(lit(3.0) * col("triangles") / col("wedges"), 4).as("clustering"))
  }
}
