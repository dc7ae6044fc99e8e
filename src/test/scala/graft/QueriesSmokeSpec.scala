package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and yields a schema + rows.
  * (Value-level correctness is the DuckDB oracle gate — scripts/
  * check.py / the driver's CORRECTNESS run; this is the cheap local
  * regression net.) */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry() returns rows for the driver smoke check") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle — the 100%-value-oracled bar holds") {
    // a query without an oracle silently downgrades to the driver's
    // rows-only check; four rounds at zero rows-only entries is a
    // regression this spec makes loud
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }
}
