package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType/DoubleType) columns, built
  * entirely from codegen'd higher-order functions — no UDFs, so the
  * whole similarity pipeline stays inside whole-stage codegen and
  * works identically on a 1000-executor cluster.
  *
  * Determinism note (oracle parity): `aggregate` folds left-to-right
  * sequentially within one row, so the double summation order is fixed
  * — IEEE-identical with DuckDB's list_* functions on the same values
  * (SURVEY §2.C Q18).
  */
object VectorFunctions {

  /** Σ a[i]*b[i] in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane signature (LSH for cosine): sign bits of dot
    * products with `planes` deterministic pseudo-random hyperplanes,
    * packed into a long. Used to bucket near-duplicate candidates so
    * the pair join is per-bucket instead of all-pairs.
    *
    * The hyperplanes are derived from a splitmix-style integer mix of
    * (seed, planeIdx, dim) — deterministic across runs and engines-free
    * (pure Spark arithmetic), no driver-side randomness.
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    require(planes <= 63, "signature packs into one long")
    val bits = (0 until planes).map { p =>
      // dot(vec, H_p) where H_p[d] = mix(seed, p, d) scaled to [-1, 1]
      val comps = (0 until dim).map { d =>
        val h = mix64(seed * 0x9e3779b97f4a7c15L + p * 0xbf58476d1ce4e5b9L + d)
        val w = (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
        element_at(vec, d + 1).cast("double") * lit(w)
      }
      val proj = comps.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
