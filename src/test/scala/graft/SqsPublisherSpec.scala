package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SqsPublisher

class SqsPublisherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("golden envelope: nodes then relations, header-order keys") {
    val nodes = Seq(("mysql://main.shop/orders", "Table", "orders"))
      .toDF("KEY", "LABEL", "name")
    val rels = Seq(("mysql://main.shop", "Schema", "mysql://main.shop/orders",
      "Table", "TABLE", "TABLE_OF"))
      .toDF("START_KEY", "START_LABEL", "END_KEY", "END_LABEL", "TYPE", "REVERSE_TYPE")
    val t = new SqsPublisher.Recording
    val body = SqsPublisher.publishParity(nodes, rels, t, "q://x")
    assert(body ==
      """{"nodes": [{"KEY": "mysql://main.shop/orders", "LABEL": "Table", "name": "orders"}], """ +
      """"relations": [{"START_KEY": "mysql://main.shop", "START_LABEL": "Schema", """ +
      """"END_KEY": "mysql://main.shop/orders", "END_LABEL": "Table", "TYPE": "TABLE", """ +
      """"REVERSE_TYPE": "TABLE_OF"}]}""")
    assert(t.sent.map(m => (m._1, m._3)) == Seq(("q://x", "metadata")))
  }

  test("json escaping: quotes, newlines, control chars, nulls") {
    val j = SqsPublisher.rowJson(Seq("a", "b"), Seq("x\"y\nz" + 1.toChar, null))
    assert(j == """{"a": "x\"y\nz""" + "\\u0001" + """", "b": null}""")
  }

  test("parity mode enforces the 250 KB reference bound") {
    val big = Seq.fill(3000)("x" * 100).zipWithIndex
      .map { case (s, i) => (s"k$i", "Label", s) }
      .toDF("KEY", "LABEL", "name")
    val rels = spark.emptyDataFrame
    val t = new SqsPublisher.Recording
    val e = intercept[SqsPublisher.MessageTooLarge] {
      SqsPublisher.publishParity(big, big.limit(0), t, "q://x")
    }
    assert(e.bytes > SqsPublisher.MaxMessageBytes)
    assert(t.sent.isEmpty) // nothing sent on failure
  }

  test("chunked mode: every row delivered, every message under the cap") {
    val nodes = (1 to 500).map(i => (s"key$i", "Label", "v" * 50))
      .toDF("KEY", "LABEL", "name")
    val rels = (1 to 100).map(i => (s"s$i", "A", s"e$i", "B", "T", "T_OF"))
      .toDF("START_KEY", "START_LABEL", "END_KEY", "END_LABEL", "TYPE", "REVERSE_TYPE")
    val t = new SqsPublisher.Recording
    SqsPublisher.publishChunked(nodes, rels, t, "q://x", maxBytes = 2048)
    val bodies = t.sent.map(_._2)
    assert(bodies.forall(_.getBytes("UTF-8").length <= 2048))
    val keyCount = bodies.map(b => "\"KEY\"".r.findAllIn(b).size).sum
    val relCount = bodies.map(b => "\"START_KEY\"".r.findAllIn(b).size).sum
    assert(keyCount == 500 && relCount == 100)
  }
}
