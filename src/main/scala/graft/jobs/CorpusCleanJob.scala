package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Training-corpus cleaning pipeline — the composition the mandated
  * extension operators exist for: blocklist subtraction → quality
  * filter → repetition filter → near-duplicate removal → language
  * tagging → deterministic split, in one lazy plan chain.
  *
  *   1. subtract the takedown/eval blocklist, if given (Bloom-constant
  *      prefilter — at 100 TB the overwhelming clean majority never
  *      reaches a join);
  *   2. drop documents below `minQuality` (cheap narrow filter early,
  *      shrinking everything downstream);
  *   3. drop template-spam: documents whose duplicate-token ratio
  *      exceeds `maxRepRatio` (repetitionStats);
  *   4. optionally cut cross-document duplicate SPANS out of the text
  *      (Lee-et-al sliding-window scrub — Dedup.scrubDuplicateSpans;
  *      docs emptied by the cut are dropped, n_chars re-derived);
  *   5. drop near-duplicates (n-gram Jaccard candidates → connected
  *      components → keep min doc_id per cluster);
  *   6. optionally cap documents per source (the Common-Crawl "≤ n
  *      pages per domain" rule — Sampling.capPerGroup, heap-bounded);
  *   7. optionally rebalance the source mixture: uniform-share
  *      downsampling (Sampling.mixtureKeep) OR temperature flattening
  *      (Sampling.temperatureKeep, p_s ∝ n_s^0.5) — both deterministic
  *      md5-bucket rules, mutually exclusive;
  *   8. tag the survivors with the stopword-vote language ID;
  *   9. assign the reproducible md5-bucket train/test split (a pure
  *      function of doc_id — stable across engines and re-runs).
  *
  * Every stage is an engine operator with its own oracle/spec; this
  * job is the end-to-end wiring (and a runnable:
  * `runMain graft.jobs.CorpusCleanJob <sfDir> <outDir>`).
  */
object CorpusCleanJob {

  def clean(spark: SparkSession, docs: DataFrame,
            minQuality: Double = 0.5, jaccardThreshold: Double = 0.5,
            blocklist: Option[DataFrame] = None,
            blockKeyCol: String = "blocked_id",
            maxRepRatio: Double = 0.95,
            balanceMixture: Boolean = false,
            temperatureMixture: Boolean = false,
            capPerSource: Option[Int] = None,
            scrubSpans: Boolean = false, spanWidth: Int = 8): DataFrame = {
    require(!(balanceMixture && temperatureMixture),
      "balanceMixture and temperatureMixture are alternative mixing rules")
    val unblocked = blocklist
      .map(bl => Dedup.blocklistSubtract(docs, "doc_id", bl, blockKeyCol))
      .getOrElse(docs)
    val scored = unblocked.withColumn("quality", TextAnalysis.qualityScore(col("text")))
    val kept = scored.filter(col("quality") >= minQuality)
    val unrepetitive = kept.join(
      TextAnalysis.repetitionStats(kept, "doc_id", "text")
        .filter(col("rep_ratio") <= maxRepRatio).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val despanned =
      if (scrubSpans) {
        // text is replaced by the span-scrubbed rebuild; docs emptied
        // by the cut drop out here, and n_chars is re-derived so the
        // later mixture weighting sees the post-scrub volume
        val scrubbed = Dedup.scrubDuplicateSpans(
          unrepetitive, "doc_id", "text", spanWidth)
          .filter(col("n_kept") > 0)
          .select(col("doc_id"), col("clean_text"))
        unrepetitive.drop("text", "n_chars")
          .join(scrubbed, Seq("doc_id"))
          .withColumnRenamed("clean_text", "text")
          .withColumn("n_chars", length(col("text")).cast("long"))
      } else unrepetitive
    val pairs = Dedup.ngramJaccardPairs(despanned, "doc_id", "text", jaccardThreshold)
    val deduped = Dedup.dropNearDuplicates(despanned, "doc_id", pairs)
    val capped = capPerSource
      .map(n => Sampling.capPerGroup(deduped, "doc_id", "source", n))
      .getOrElse(deduped)
    val balanced =
      if (balanceMixture) Sampling.mixtureKeep(capped, "doc_id", "source", "n_chars")
      else if (temperatureMixture) Sampling.temperatureKeep(capped, "doc_id", "source")
      else capped
    TextAnalysis.langId(spark, balanced, "doc_id", "text")
      .join(balanced, Seq("doc_id"))
      .withColumn("split", Sampling.splitColumn(col("doc_id"), testBuckets = 2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_clean_corpus"
    val spark = graft.core.Sessions.local(appName = "graft-corpus-clean")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val cleaned = clean(spark, docs)
    cleaned.write.mode("overwrite").parquet(outDir)
    val total = docs.count()
    val kept = spark.read.parquet(outDir).count()
    println(s"[corpus-clean] input=$total kept=$kept dropped=${total - kept} out=$outDir")
    spark.stop()
  }
}
