package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and yields a schema + rows.
  * (Value-level correctness is the DuckDB oracle gate — scripts/
  * check.py / the driver's CORRECTNESS run; this is the cheap local
  * regression net.) */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq.sortBy(_._1)
    .foreach { case (name, fn) =>
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

  test("every query has an oracle — the value-oracled bar is exact (bench-only entries live in benchOnly)") {
    // a query without an oracle silently downgrades to the driver's
    // rows-only check (recorded as `err: no_oracle` — two rounds of
    // red artifact rows before the benchOnly split); deliberately
    // non-oracled entries belong in SparkEntry.benchOnly, never here
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("benchOnly is disjoint from queries and carries no oracle") {
    // a benchOnly entry that leaks into `queries` resurrects the
    // round-15/16 `err: no_oracle` artifact row; one that grows an
    // oracle should be promoted to `queries` instead
    val overlap = SparkEntry.benchOnly.keySet & SparkEntry.queries.keySet
    assert(overlap.isEmpty, s"benchOnly entries shadowing queries: $overlap")
    val oracled = SparkEntry.benchOnly.keySet & SparkEntry.oracleSql.keySet
    assert(oracled.isEmpty,
      s"benchOnly entries with oracles — promote to queries: $oracled")
    assert(SparkEntry.benchOnly.nonEmpty,
      "benchOnly registry vanished — x_winsorize_sketch_prod should live here")
  }

  test("doc headers quote the real query count (round-7 verdict: hand-edited counts drift)") {
    // OPERATORS.md's "N oracle-checked queries" tracks the ORACLED
    // count; README.md's "driver contract: N queries" tracks the total
    // and "N of M with DuckDB oracle" / "N/N PASS expected" the oracled
    // count — this spec fails on the next hand-edit drift
    val n = SparkEntry.queries.size
    val nOracled = SparkEntry.oracleSql.size
    def counts(path: String, re: scala.util.matching.Regex): Seq[Int] = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try re.findAllMatchIn(src.mkString).map(_.group(1).toInt).toSeq
      finally src.close()
    }
    val ops = counts("OPERATORS.md", raw"(\d+) oracle-checked queries".r)
    assert(ops.nonEmpty && ops.forall(_ == nOracled),
      s"OPERATORS.md says $ops oracle-checked queries, engine has $nOracled")
    val readmeTotal = counts("README.md", raw"driver contract: (\d+) queries".r)
    assert(readmeTotal.nonEmpty && readmeTotal.forall(_ == n),
      s"README.md quotes total $readmeTotal, engine has $n")
    val readmeOracled = counts("README.md", raw"(\d+) of \d+ with DuckDB oracle".r) ++
      counts("README.md", raw"(\d+)/\d+ PASS expected".r)
    assert(readmeOracled.nonEmpty && readmeOracled.forall(_ == nOracled),
      s"README.md quotes oracled counts $readmeOracled, engine has $nOracled")
  }
}
