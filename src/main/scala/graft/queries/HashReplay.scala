package graft.queries

/** Single source of truth for the DuckDB-side replay of the engine's
  * 64-bit hash family (FNV-1a, splitmix64, signed-order bijection) —
  * the machinery that lets the hash-family dedup operators
  * (x_minhash_pairs / x_simhash_pairs) be value-level oracled.
  *
  * Both the oracle SQL (generated in [[TextDocs]]) and the BigInt
  * model (property-checked against the JVM kernels in GraftProperties)
  * are built from THE SAME constants and the same 32-bit-split
  * multiply decomposition, so drift in either side fails a test
  * instead of silently corrupting an oracle (round-2 verdict item 8).
  *
  * Bit-pattern equivalences (HUGEINT is 128-bit SIGNED):
  *  - xor/shift on values < 2^64 equal the JVM's unsigned long bit ops
  *    (>>> == >> on non-negative HUGEINT);
  *  - 64-bit wrap-around multiply z*c: z split into 32-bit halves,
  *    (lo*c + (hi*c mod 2^32)*2^32) mod 2^64 — every intermediate fits
  *    a signed 128-bit value;
  *  - the JVM's SIGNED long compare: xor with 2^63 is an
  *    order-preserving bijection from signed to unsigned order and
  *    preserves equality.
  */
object HashReplay {

  /** 2^64 as BigInt and as SQL text. */
  val M: BigInt = BigInt(1) << 64
  val MSql: String = "18446744073709551616"
  /** 2^64 − 1 as SQL text — the bitwise-AND twin of [[MSql]] for
    * mod-2^64 on the non-negative HUGEINT domain (`&` is a cheap
    * int128 op where `%` is a full 128-bit division). */
  val Mask: String = "18446744073709551615"
  private val TwoPow32 = BigInt(1) << 32

  // decimal (unsigned) renderings of the JVM constants in
  // functions/Hashing.scala and functions/MinHash.scala
  val FnvOffset: BigInt = BigInt("14695981039346656037")  // 0xcbf29ce484222325
  val FnvPrime: BigInt = BigInt("1099511628211")          // 0x100000001b3
  val SplitmixGamma: BigInt = BigInt("11400714819323198485") // 0x9e3779b97f4a7c15
  val SplitmixC1: BigInt = BigInt("13787848793156543929")    // 0xbf58476d1ce4e5b9
  val SplitmixC2: BigInt = BigInt("10723151780598845931")    // 0x94d049bb133111eb
  val SignBit: BigInt = BigInt("9223372036854775808")        // 2^63

  /** SQL: (z * c) mod 2^64 without overflowing signed HUGEINT.
    *
    * The mod-2^k / div-2^k steps are BITWISE (& mask, >> k, << k) —
    * identities on the non-negative domain (z < 2^64, every
    * intermediate < 2^97, well inside signed 128-bit) — because
    * DuckDB's HUGEINT `%`/`//` are full 128-bit divisions: with the
    * division form ONE mix stage over a 30M-row replay measured 120 s
    * at sf0.1; the bitwise form is a handful of cheap int128 ops. */
  def mulmodSql(z: String, c: BigInt): String =
    s"(((($z) & 4294967295) * $c + ((((($z) >> 32) * $c) & 4294967295) << 32)) & ${M - 1})"

  /** BigInt model of [[mulmodSql]] — the identical bitwise
    * decomposition, so a wrong split in the SQL text means a wrong
    * split here too and the property against the JVM multiply catches
    * it. */
  def mulmod(z: BigInt, c: BigInt): BigInt =
    ((z & (TwoPow32 - 1)) * c + ((((z >> 32) * c) & (TwoPow32 - 1)) << 32)) & (M - 1)

  /** splitmix64 finalizer as chained SQL CTEs over column `z` of
    * `src`, keyed by `keys` (the SQL twin of [[mix]]); callers add the
    * gamma term in their `_z` source CTE.
    *
    * MATERIALIZED is load-bearing: DuckDB flattens plain CTE
    * projections into per-REFERENCE expressions with no common
    * subexpression elimination, and each mix stage references its
    * input z 4 times (2 in the xor, doubled by the mulmod split) — the
    * three chained stages therefore expand to ~32 evaluations of the
    * full upstream HUGEINT chain (measured 335 s for a 30M-row replay
    * at sf0.1; materialized stages run each op once). Values are
    * identical either way.
    */
  def mixCtesSql(prefix: String, src: String, keys: String): String =
    s"""${prefix}_a AS MATERIALIZED (SELECT $keys, ${mulmodSql("xor(z, z >> 30)", SplitmixC1)} AS z FROM $src),
       |${prefix}_b AS MATERIALIZED (SELECT $keys, ${mulmodSql("xor(z, z >> 27)", SplitmixC2)} AS z FROM ${prefix}_a),
       |$prefix AS MATERIALIZED (SELECT $keys, xor(z, z >> 31) AS z FROM ${prefix}_b)""".stripMargin

  /** splitmix64 finalizer over an unsigned z — BigInt model of the
    * mixCtes SQL chain in [[TextDocs]]. */
  def mix(z0: BigInt): BigInt = {
    def xs(z: BigInt, s: Int): BigInt = z ^ (z >> s)
    xs(mulmod(xs(mulmod(xs(z0, 30), SplitmixC1), 27), SplitmixC2), 31)
  }

  /** Full splitmix64 step (gamma add + finalizer), as the minhash
    * permutation family applies it: seed_j = mix(j + gamma),
    * value = mix((h ^ seed_j) + gamma). */
  def mixWithGamma(z: BigInt): BigInt = mix((z + SplitmixGamma) % M)

  /** SQL: FNV-1a 64 fold over the characters of `strExpr` (ASCII text,
    * so ord(char) == utf-8 byte) — plain HUGEINT multiply is safe:
    * h < 2^64 and the prime is 40 bits, so the product stays inside
    * signed 128-bit. Single source for the shingle-hash and
    * fingerprint oracles. */
  def fnvFoldSql(strExpr: String): String =
    s"""list_reduce(list_prepend(CAST($FnvOffset AS HUGEINT),
       |      list_transform(range(1, length($strExpr) + 1), i -> ord(substr($strExpr, i, 1)))),
       |      (h, b) -> (xor(h, CAST(b AS HUGEINT)) * $FnvPrime) % $MSql)""".stripMargin

  /** FNV-1a 64 over bytes — BigInt model of [[fnvFoldSql]]. */
  def fnv(bytes: Array[Byte]): BigInt =
    bytes.foldLeft(FnvOffset) { (h, b) =>
      ((h ^ BigInt(b & 0xff)) * FnvPrime) % M
    }

  /** Unsigned rendering of a JVM long (the HUGEINT value the SQL side
    * works with). */
  def unsigned(l: Long): BigInt = {
    val b = BigInt(l)
    if (b < 0) b + M else b
  }

  /** Signed→unsigned order bijection (xor 2^63). */
  def signedOrderKey(z: BigInt): BigInt = z ^ SignBit
}
