package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphExpansion
import graft.queries.GraphQ

/** Fixture invariants from FIXTURES.md §2: node counts per label and
  * the no-dangling-keys property (SURVEY §5.3). */
class GraphExpansionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val tables =
    GraphExpansion.tableMetadata(spark, GraphQ.readColumnsMeta(spark)).cache()

  test("A1 grouping: 3 tables with ordered columns") {
    val t = tables.collect().sortBy(_.tableKey)
    assert(t.length == 3)
    val orders = t.find(_.name == "orders").get
    assert(orders.columns.map(_.name) == Seq("id", "cust_id", "total"))
    assert(orders.columns.map(_.sortOrder) == Seq(1, 2, 3))
    assert(orders.description.contains("order facts"))
    val customers = t.find(_.name == "customers").get
    assert(customers.description.isEmpty) // empty CSV cell → no node
    val dailyRev = t.find(_.name == "daily_rev").get
    assert(dailyRev.isView)
  }

  test("G1 node counts per label match the fixture contract") {
    val nodes = GraphExpansion.nodes(spark, tables).collect()
    val byLabel = nodes.groupBy(_.label).view.mapValues(_.length).toMap
    assert(byLabel == Map(
      "Database" -> 1, "Cluster" -> 1, "Schema" -> 2, "Table" -> 3,
      "Description" -> 6, // 2 table descriptions + 4 column descriptions
      "Column" -> 7))
    assert(nodes.length == 20)
  }

  test("G2 relations: 19 edges, no dangling keys") {
    val nodes = GraphExpansion.nodes(spark, tables).collect()
    val rels = GraphExpansion.relations(spark, tables).collect()
    assert(rels.length == 19)
    val keys = nodes.map(_.key).toSet
    rels.foreach { r =>
      assert(keys.contains(r.startKey), s"dangling start ${r.startKey}")
      assert(keys.contains(r.endKey), s"dangling end ${r.endKey}")
    }
    // every relation carries a forward and a reverse type
    assert(rels.forall(r => r.relType.nonEmpty && r.reverseType.nonEmpty))
  }

  test("key scheme follows db://cluster.schema/table/col") {
    val nodes = GraphExpansion.nodes(spark, tables).collect()
    assert(nodes.exists(_.key == "mysql://main.shop/orders"))
    assert(nodes.exists(_.key == "mysql://main.shop/orders/cust_id"))
    assert(nodes.exists(_.key == "mysql://main.shop/orders/_description"))
    assert(nodes.exists(_.key == "database://mysql"))
  }
}
