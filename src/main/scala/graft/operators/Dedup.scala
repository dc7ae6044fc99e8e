package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fnv1a64

/** Deduplication operators for the training-data pipeline (SURVEY §2.B
  * X15/X16): exact, n-gram Jaccard (shingle-bucketed), SimHash, and
  * MinHash+LSH.
  *
  * Scale design: every variant avoids the all-pairs O(n²) comparison by
  * generating candidates through a shared key (content hash, shingle,
  * LSH band) and joining on it — the 100 TB-safe shape. Skew guard for
  * the shingle join: shingles whose document frequency exceeds
  * `maxShingleDf` are dropped from candidate generation (a standard
  * frequency cap; hot shingles carry no discriminating signal anyway).
  */
object Dedup {

  /** Exact dedup on selected columns: keep the row with the smallest
    * tie-break key per duplicate group. Deterministic (unlike
    * dropDuplicates, which keeps an arbitrary row); one hash-agg
    * shuffle on the dedup key.
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val others = df.columns.filterNot(keyCols.contains).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(others.map(col): _*), col(tieBreak)).as("__rest"))
      .select(keyCols.map(col) ++ others.map(c => col(s"__rest.$c")): _*)
  }

  /** Distinct word n-gram shingles as an array column (short docs fall
    * back to one whole-doc shingle so they still get a key). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, "\\s+")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard with shingle-bucket
    * candidate generation: explode distinct shingles → self-join on the
    * shingle → count shared shingles per pair → Jaccard =
    * |A∩B| / (|A|+|B|−|A∩B|). Only pairs sharing ≥1 (non-hot) shingle
    * are ever materialized; output is (ida, idb, jaccard) with ida<idb.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, n: Int = 3,
                        maxShingleDf: Long = 1000L): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
    val counts = sh.groupBy(col("id")).agg(count(lit(1)).as("nsh"))
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select("sh")
    val pruned = sh.join(hot, Seq("sh"), "left_anti")
    val shared = pruned.select(col("sh"), col("id").as("ida"))
      .join(pruned.select(col("sh"), col("id").as("idb")), Seq("sh"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
    shared
      .join(counts.select(col("id").as("ida"), col("nsh").as("na")), Seq("ida"))
      .join(counts.select(col("id").as("idb"), col("nsh").as("nb")), Seq("idb"))
      .withColumn("__j", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("__j") >= threshold) // filter BEFORE rounding (oracle parity)
      .select(col("ida"), col("idb"), round(col("__j"), 4).as("jaccard"))
  }

  /** 64-bit SimHash of the whitespace token stream: per-token FNV-1a
    * hash, per-bit ±1 majority vote, packed into a long. Pure codegen'd
    * expressions (no UDF); one pass over each document.
    */
  def simhash(spark: SparkSession, text: Column): Column = {
    Fnv1a64.register(spark)
    val hashes = transform(split(text, "\\s+"), t => call_function("graft_fnv64", t))
    val ntok = size(hashes).cast("long")
    val packed = (0 until 64).map { i =>
      val ones = size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L))).cast("long")
      when(ones * 2 > ntok, lit(1L << i)).otherwise(lit(0L))
    }
    packed.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-duplicate candidate pairs: band the 64-bit signature
    * into four 16-bit bands and join on (band index, band value) — two
    * signatures within Hamming distance 3 are guaranteed to collide in
    * ≥1 band. Pairs are then verified with an exact popcount bound.
    */
  def simhashPairs(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(spark, col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bval"))
      }: _*)).as("bd"))
      .select(col("id"), col("sig"), col("bd.band"), col("bd.bval"))
    val cand = banded.select(col("band"), col("bval"), col("id").as("ida"), col("sig").as("siga"))
      .join(banded.select(col("band"), col("bval"), col("id").as("idb"), col("sig").as("sigb")),
        Seq("band", "bval"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "siga", "sigb").distinct()
    cand
      .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }

  /** MinHash+LSH near-duplicate pairs via spark.ml (tokenize → binary
    * HashingTF shingle space → MinHashLSH banded join). Seeded, so
    * results are reproducible run-to-run; still excluded from the
    * cross-engine oracle (hash family is Spark-specific).
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   jaccardDistanceThreshold: Double,
                   numHashTables: Int = 8, seed: Long = 42L): DataFrame = {
    val toks = new Tokenizer().setInputCol(textCol).setOutputCol("__toks")
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(toks.transform(docs))
    val lsh = new MinHashLSH().setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, jaccardDistanceThreshold, "dist")
      .select(col(s"datasetA.$idCol").as("ida"), col(s"datasetB.$idCol").as("idb"),
        round(col("dist"), 4).as("jaccard_dist"))
      .filter(col("ida") < col("idb"))
  }
}
