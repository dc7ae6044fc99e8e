package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation pipeline COMPOSED as a library call — the operators a
  * training-data run chains every time (quality gate → keep-best
  * near-dup dedup → leakage-safe grouped split → sequence packing),
  * wired in their canonical order so a user gets the whole flow from
  * one entry point instead of re-deriving the composition. Each stage
  * is the existing audited operator ([[TextAnalysis.qualityScore]],
  * [[Dedup.ngramJaccardPairs]] + [[Dedup.dropNearDuplicatesBy]],
  * [[Sampling.groupSplit]], [[Sampling.packBins]]); this object adds
  * NO new semantics, only the composition — which is exactly what the
  * x_curation_funnel oracle value-checks end to end.
  *
  * Scale shape: every stage keeps its own audited plan (the dedup
  * stage's banded candidate generation, the split's pure-hash
  * assignment, packing's bucketed prefix sum in the sharded form).
  * The returned frames are lazy — a caller materializing more than one
  * should persist `quality` first, since each stage's plan builds on
  * the previous one's.
  */
object Curation {

  /** The four stage frames, lazy and plan-shared: `quality` (gated
    * docs), `deduped` (near-dup survivors, best copy kept), `train`
    * (the train-split rows — `val`/`test` are the dropped buckets),
    * `packed` ((orderCol, toks, bin) under the token budget). */
  case class Stages(quality: DataFrame, deduped: DataFrame,
                    train: DataFrame, packed: DataFrame)

  /** Run the pipeline over `docs`. `idCol` uniquely identifies a doc,
    * `textCol` is the text, `priorityCol` ranks near-dup cluster
    * members (highest kept), `groupCol` is the leakage unit the split
    * hashes (source/domain/author). `minQuality` gates on
    * [[TextAnalysis.qualityScore]]; `minJaccard` is the near-dup
    * threshold; `valBuckets`/`testBuckets` of `nBuckets` go to
    * val/test; `tokenBudget` caps a packed sequence. Token counts use
    * whitespace tokens ([[TextAnalysis.tokenCount]]) — swap in a BPE
    * count by packing the returned `train` frame yourself when exact
    * subword budgeting matters (x_seq_pack_bpe's shape). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             priorityCol: String, groupCol: String,
             minQuality: Double = 0.8, minJaccard: Double = 0.5,
             nBuckets: Int = 10, valBuckets: Set[Int] = Set(0),
             testBuckets: Set[Int] = Set(1),
             tokenBudget: Int = 512): Stages = {
    require(minQuality >= 0.0 && minQuality <= 1.0,
      s"Curation: minQuality must be in [0, 1], got $minQuality")
    // spread the gate: the quality regexes are CPU-heavy per byte and a
    // small corpus often arrives as one input split — and every later
    // stage (and the funnel report) builds on this frame, so the
    // exchange is shared by reuse while the parallelism survives into
    // each consumer (the Dedup repartition discipline)
    val quality = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    val pairs = Dedup.ngramJaccardPairs(quality, idCol, textCol,
      threshold = minJaccard)
    val deduped = quality.join(
      Dedup.dropNearDuplicatesBy(
        quality.select(col(idCol), col(priorityCol)),
        idCol, priorityCol, pairs).select(idCol),
      Seq(idCol))
    val train = Sampling.groupSplit(deduped, groupCol, nBuckets,
        valBuckets, testBuckets)
      .filter(col("split") === "train")
    val packed = Sampling.packBins(
      train.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks")),
      idCol, "toks", tokenBudget)
    Stages(quality, deduped, train, packed)
  }

  /** The per-stage (docs, tokens) funnel every curation run reports —
    * one row per stage in pipeline order (`a_all` … `e_packed`; the
    * packed row's `docs` is the BIN count). This is the
    * x_curation_funnel readout.
    *
    * Evaluated EAGERLY over persisted stage frames: each stage's plan
    * builds on the previous one's (the [[curate]] scaladoc's "persist
    * `quality` first" advice, applied where the library itself
    * materializes several stages) — a lazy five-branch union would
    * re-run the quality gate for every later branch and the dedup
    * survivor selection three times. The collect is bounded at exactly
    * five rows by construction (one aggregate row per stage), and the
    * caches are released before returning, so nothing leaks past the
    * call. */
  def funnelReport(docs: DataFrame, textCol: String,
                   stages: Stages): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shared = Seq(stages.quality, stages.deduped, stages.train)
    shared.foreach(_.persist(lvl))
    // materialize the chain SEQUENTIALLY before the five-branch report
    // runs: union branches execute concurrently inside one job, so a
    // merely-persisted frame would be recomputed by every branch racing
    // the cache population; each count() here reads the previous
    // stage's already-cached rows, so the whole chain runs once
    shared.foreach(_.count())
    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("docs"),
          coalesce(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")),
            lit(0L)).as("tokens"))
        .select(lit(name).as("stage"), col("docs"), col("tokens"))
    val report =
      stage("a_all",
          docs.repartition(docs.sparkSession.sparkContext.defaultParallelism))
        .unionAll(stage("b_quality", stages.quality))
        .unionAll(stage("c_dedup", stages.deduped))
        .unionAll(stage("d_train", stages.train))
        .unionAll(stages.packed
          .agg(countDistinct(col("bin")).as("docs"),
            coalesce(sum(col("toks")), lit(0L)).as("tokens"))
          .select(lit("e_packed").as("stage"), col("docs"), col("tokens")))
        .orderBy("stage")
    val rows = report.collect() // five rows by construction — see scaladoc
    shared.foreach(_.unpersist())
    docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), report.schema)
  }
}
