package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-start schema-drift sentinel (INCIDENTS.md R6-1 class): pins
  * the RAW Spark-level schema of every driver-generated parquet table
  * so a regenerated testdata set with changed physical types fails
  * here with a one-line diagnosis before any query runs. The python
  * twin (scripts/schema_diff.py + schema_manifest.json) covers the
  * driver side; this spec covers `sbt test`.
  *
  * The round-6 outage this guards against: events.ts silently moved
  * from TIMESTAMP(NANOS) to no-timezone timestamp[us] (Spark 4 reads
  * it as TIMESTAMP_NTZ), and three as-of/interval queries failed with
  * opaque epoch-function errors. `Tables.normalizeEvents` folds the
  * NTZ variants; this spec is the loud early warning when the driver
  * drifts again (a NEW type would fail here first).
  */
class SchemaSentinelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // raw spark.read.parquet DDL — intentionally NOT Tables.load, which
  // normalizes; the sentinel watches the physical layer normalization
  // is built on
  private val expected = Map(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
      "c_acctbal DOUBLE,c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING," +
      "p_size INT,p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING," +
      "o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT," +
      "l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE," +
      "l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING," +
      "l_shipdate TIMESTAMP_NTZ"),
    "events" -> ("event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT," +
      "event_type STRING,value DOUBLE,props STRING"),
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  private val roots = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)

  test("a testdata root exists to sentinel") {
    assert(roots.nonEmpty, "no /root/testdata/sf* roots found")
  }

  roots.foreach { root =>
    test(s"physical schemas at $root match the pinned manifest") {
      val drifts = expected.toSeq.sortBy(_._1).flatMap { case (t, ddl) =>
        val f = new java.io.File(s"$root/$t.parquet")
        if (!f.exists()) Some(s"$t: MISSING at $root")
        else {
          val got = spark.read.parquet(f.getPath).schema.toDDL
          if (got == ddl) None
          else Some(s"$t: physical schema drifted\n  pinned: $ddl\n  found : $got\n" +
            "  (driver regenerated testdata — extend Tables normalization, " +
            "then re-pin here AND in scripts/schema_manifest.json, " +
            "then re-run the full Verify gate)")
        }
      }
      assert(drifts.isEmpty, drifts.mkString("\n"))
    }
  }
}
