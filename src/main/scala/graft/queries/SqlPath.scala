package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Queries through the SQL text entry path (`spark.sql` over registered
  * views) — the engine's second front end next to the DataFrame API.
  * The SQL is ANSI-portable, so the oracle runs the identical text.
  */
object SqlPath {
  private type Q = (SparkSession, String) => DataFrame

  private val existsSql =
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  private val cteSql =
    """WITH spend AS (
      |  SELECT o_custkey,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |  FROM orders GROUP BY o_custkey)
      |SELECT c_mktsegment, c_custkey, total FROM (
      |  SELECT c.c_mktsegment, c.c_custkey, s.total,
      |         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
      |                            ORDER BY s.total DESC, c.c_custkey) AS rn
      |  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey) x
      |WHERE rn <= 3 ORDER BY c_mktsegment, c_custkey""".stripMargin

  // temp views are session-scoped and all tables are re-registered when
  // a session's dir changes — but NOT on every invocation: round-2
  // verdict item 6, registerAll (10 parquet reads + schema inference)
  // per call dominated x_sql_cte's bench time. Tracks the CURRENT dir
  // per session (view names are shared, so two dirs cannot both be
  // "registered" on one session), and the check+register is atomic —
  // the round-3 single-slot memo let one thread's SQL run against the
  // other thread's freshly re-registered views.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def run(sql: String): Q = (s, dir) => {
    // compute() holds the PER-KEY lock for the check+register (the
    // lambda touches the session, never the map, so it is legal inside
    // compute) — two different sessions register concurrently instead
    // of serializing on a global monitor (review)
    registeredDir.compute(graft.core.Sessions.uuid(s), (_, prev) => {
      if (prev != dir) Tables.registerAll(s, dir)
      dir
    })
    s.sql(sql)
  }

  private val groupingSetsSql =
    // explicit NULLS FIRST: Spark's ASC default is nulls-first while
    // DuckDB's is nulls-last — the identical text must order identically
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  private val lateralSql =
    // LEFT JOIN LATERAL ... ON true, NOT the comma form: DuckDB
    // decorrelates `c, LATERAL (agg)` to an inner join and DROPS a
    // customer with no orders, while Spark keeps it with a NULL
    // aggregate — the sf0.1 corpus has exactly one such customer and
    // caught the 1-row divergence. The explicit left lateral join is
    // all-rows-preserving in both engines.
    """SELECT c.c_custkey, t.mx FROM customer c
      |LEFT JOIN LATERAL (SELECT MAX(o.o_totalprice) AS mx FROM orders o
      |                   WHERE o.o_custkey = c.c_custkey) t ON true
      |ORDER BY c.c_custkey""".stripMargin

  val defs: Map[String, Q] = Map(
    "x_sql_exists" -> run(existsSql),
    "x_sql_cte" -> run(cteSql),
    "x_sql_grouping_sets" -> run(groupingSetsSql),
    "x_sql_lateral" -> run(lateralSql))

  val oracle: Map[String, String] = Map(
    "x_sql_exists" -> existsSql,
    "x_sql_cte" -> cteSql,
    "x_sql_grouping_sets" -> groupingSetsSql,
    "x_sql_lateral" -> lateralSql)
}
