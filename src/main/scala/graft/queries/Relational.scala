package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declared relational queries Q1–Q14, Q23, Q24 (SURVEY §2.C).
  *
  * Each entry is a DataFrame-API plan (Catalyst gets full freedom:
  * pushdown, pruning, join selection) paired in SparkEntry with the
  * DuckDB oracle SQL. Cross-engine float determinism: money math is
  * cast to DECIMAL(18,2) BEFORE aggregation (decimal addition is exact
  * and associative, so shuffle order can't change the result — SURVEY
  * §7 hard-part 1), and every output is totally ordered.
  *
  * Scale notes (100 TB):
  *  - dimension joins (nation/region) are explicitly broadcast;
  *  - aggregations are plain groupBy → Tungsten partial+final hash agg;
  *  - top-k per group is window + filter (no global sort of the fact);
  *  - global sort+limit compiles to TakeOrderedAndProject (no full sort).
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private val D = "decimal(18,2)"

  val defs: Map[String, Q] = Map(
    "q01_scan" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_type")).as("typ"),
        when(col("p_size") > 25, "big").otherwise("small").as("size_class"))
        .orderBy("p_partkey")
    }),

    "q02_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24
          && col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q03_left_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), col("n_name"))
        .orderBy("c_custkey")
    }),

    "q04_join_chain" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("c_custkey"), col("n_name"), col("r_name"))
        .orderBy("c_custkey")
    }),

    "q05_sort_limit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .limit(1000)
    }),

    "q06_group_concat" -> ((s, dir) => {
      // collect_list order is shuffle-dependent → array_sort restores
      // determinism (SURVEY §7 hard-part 2).
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_join(array_sort(collect_list(col("l_linenumber").cast("string"))), ",").as("lines"))
        .orderBy("l_orderkey")
    }),

    "q07_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Decimal BEFORE the sum keeps the aggregation exact and
          // shuffle-order-free; the FINAL projection is DOUBLE on both
          // sides because the driver's hasher renders trailing-zero
          // decimals inconsistently between engines (round-1 verdict:
          // all values identical, hash still differed). Magnitudes here
          // (≤5e8 at scale 4) come from the same exact decimal on both
          // sides, so the double conversion is bit-identical.
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q08_distinct" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"))
    }),

    "q09_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), grouping(col("o_orderpriority")).cast("int").as("g"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"), col("g"))
    }),

    "q10_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), rank().over(w).cast("int").as("rnk"))
        .filter(col("rnk") <= 5)
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    }),

    "q11_moving_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(D)).over(w).cast("double").as("mov3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q12_topk_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("p_partkey"))
        .orderBy("p_brand", "p_partkey")
    }),

    "q13_intersect" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .intersect(t(s, dir, "customer").select(col("c_custkey").as("k")))
        .orderBy("k")
    }),

    "q14_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q23_corr_subquery" -> ((s, dir) => {
      // Decorrelated by hand: one window avg per status partition
      // (equivalent to Catalyst's RewriteCorrelatedScalarSubquery result,
      // minus the self-join).
      val w = Window.partitionBy(col("o_orderstatus"))
      t(s, dir, "orders")
        .withColumn("avg_tp", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("avg_tp"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "x_headline_revenue" -> ((s, dir) => {
      // TPC-H Q3 shape: 3-way join + filtered agg + top-k — the classic
      // "whole engine in one query" benchmark
      val cutoff = to_timestamp(lit("1995-06-15 00:00:00"))
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    "q24_union_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_partkey").as("k"))
        .unionAll(t(s, dir, "part").select(col("p_partkey")))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .orderBy("k").limit(500)
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_scan" ->
      """SELECT p_partkey, lower(p_type) AS typ,
        |  CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_left_join" ->
      """SELECT c.c_custkey, n.n_name FROM customer c
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q04_join_chain" ->
      """SELECT c.c_custkey, n.n_name, r.r_name FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q05_sort_limit" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber LIMIT 1000""".stripMargin,
    "q06_group_concat" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q07_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q08_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
        |       COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin,
    "q09_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, g""".stripMargin,
    "q10_rank" ->
      """SELECT c_mktsegment, c_custkey, rnk FROM (
        |  SELECT c_mktsegment, c_custkey,
        |         CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        |  FROM customer) t WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,
    "q11_moving_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_topk_group" ->
      """SELECT p_brand, p_partkey FROM (
        |  SELECT p_brand, p_partkey,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t WHERE rn <= 3 ORDER BY p_brand, p_partkey""".stripMargin,
    "q13_intersect" ->
      """SELECT k FROM (SELECT o_custkey AS k FROM orders
        |  INTERSECT SELECT c_custkey FROM customer) t ORDER BY k""".stripMargin,
    "q14_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q23_corr_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_orderstatus = o.o_orderstatus)
        |ORDER BY o_orderkey""".stripMargin,
    "x_headline_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-06-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q24_union_agg" ->
      """SELECT k, COUNT(*) AS c FROM (
        |  SELECT l_partkey AS k FROM lineitem UNION ALL SELECT p_partkey FROM part) t
        |GROUP BY k ORDER BY k LIMIT 500""".stripMargin
  )
}
