package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.functions.Fnv1a64
import graft.operators.Dedup

/** Dev-only profiling entry (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, 32, "scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .repartition(32).cache()
    docs.count()
    Fnv1a64.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    time("split only")(
      docs.select(size(split(col("text"), "\\s+")).as("n")).agg(sum("n")).head())

    time("shingles inline (current)")(
      docs.select(size(Dedup.shingles(col("text"))).as("n")).agg(sum("n")).head())

    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
    val sh2 = toks.select(col("doc_id"),
      array_distinct(
        when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
          .otherwise(array(concat_ws(" ", col("toks"))))).as("sh"))
    time("shingles from token attribute")(
      sh2.select(size(col("sh")).as("n")).agg(sum("n")).head())

    time("fnv over attribute shingles")(
      sh2.select(size(transform(col("sh"),
        t => call_function("graft_fnv64", t))).as("n")).agg(sum("n")).head())

    // no-distinct variant: how much does array_distinct cost?
    val sh3 = toks.select(col("doc_id"),
      transform(sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))).as("sh"))
    time("shingles no-distinct")(
      sh3.select(size(col("sh")).as("n")).agg(sum("n")).head())

    spark.stop()
  }
}
