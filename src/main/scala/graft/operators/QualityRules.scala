package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule suite — the contract-checking pass a
  * pipeline runs before promoting a batch (the deequ/great-expectations
  * shape, composed from plain aggregations). Three rule families, one
  * uniform result schema `(rule, n_rows, n_fail, pass)`:
  *
  *   - row predicates ([[rowRules]]): ALL rules evaluate in ONE
  *     partial-agged pass over the data — each rule is a
  *     `sum(violations)` agg column, the long form is a stack over the
  *     single wide result row. Adding a rule adds an accumulator,
  *     never a scan.
  *   - key uniqueness ([[uniqueRule]]): rows in key groups of size > 1
  *     count as failures; two-stage hash agg, partial map-side.
  *   - referential integrity ([[fkRule]]): child rows whose FK misses
  *     the parent key set; one anti-join (AQE broadcasts a small
  *     parent side).
  *
  * [[report]] unions the families into the single result frame the
  * promotion gate reads. All counts are exact integers — the output is
  * engine-replayable with no float tolerance.
  */
object QualityRules {

  private val schemaCols = Seq("rule", "n_rows", "n_fail", "pass")

  /** All row-predicate rules in one aggregation pass. Each entry is
    * (rule name, predicate that must HOLD for the row). NULL predicate
    * results count as failures (a null `x > 0` means x was null). */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rowRules: need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(s"__f$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', __f$i"
    }.mkString(", ")
    wide.selectExpr("__n", s"stack(${rules.size}, $stackArgs) AS (rule, n_fail)")
      .select(col("rule"), col("__n").as("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }

  /** Rows whose key tuple occurs more than once are failures. */
  def uniqueRule(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    val groups = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
    groups.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L))
          .as("n_fail"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }

  /** Child rows whose `fkCols` tuple has no match in the parent's
    * `pkCols` are failures. Null FK values fail (they match nothing —
    * use a row rule to allow optional FKs instead). */
  def fkRule(child: DataFrame, name: String, fkCols: Seq[String],
             parent: DataFrame, pkCols: Seq[String]): DataFrame = {
    require(fkCols.size == pkCols.size, "fkRule: fk/pk arity mismatch")
    val p = parent.select(pkCols.map(col): _*).distinct()
      .toDF(fkCols: _*)
    val missing = child.select(fkCols.map(col): _*)
      .join(p, fkCols, "left_anti")
    val total = child.agg(count(lit(1)).as("n_rows"))
    val fails = missing.agg(count(lit(1)).as("n_fail"))
    total.crossJoin(fails)
      .select(lit(name).as("rule"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }

  /** Union any rule-family results into the single report frame. */
  def report(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "report: need at least one part")
    parts.map(_.select(schemaCols.map(col): _*)).reduce(_ unionByName _)
  }
}
