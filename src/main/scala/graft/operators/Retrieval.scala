package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a tokenized corpus: inverted-index postings
  * and BM25 ranked search — the lexical half of a training-data search
  * stack (the embedding half is [[Similarity]]).
  *
  * Tokenization is the corpus-wide whitespace split every text operator
  * here shares (TextAnalysis.tokens semantics: `\s+`, zero-length
  * tokens dropped), so postings/df/tf agree with the tf-idf and n-gram
  * machinery.
  *
  * Scale notes (100 TB): the query term set is a handful of strings —
  * it compiles into an `isin` literal filter that runs INSIDE the scan
  * projection, so the tf shuffle carries O(matching doc × query term)
  * rows, never the corpus vocabulary. Document-length stats are a
  * second corpus pass but aggregate partially (map-side combine) down
  * to one row per doc; for a standing corpus you'd persist
  * `docLengths` once and pass it in — `bm25` takes it as an optional
  * precomputed table for exactly that. df and the (N, avgdl) scalars
  * ride as broadcast one-row/tiny joins. Nothing collects to the
  * driver.
  */
object Retrieval {

  /** `\s+` split, zero-length dropped — one (docId, term) row per
    * occurrence. */
  private def tokenRows(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("__id"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)

  /** Per-document token count (BM25's length normalizer). One partial-
    * agged hash agg; persist this for a standing corpus and hand it to
    * [[bm25]] so repeated queries skip the second corpus pass. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenRows(docs, idCol, textCol)
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("dl"))

  /** Inverted index: term → df + postings (doc ids sorted ascending).
    *
    * `maxDf` is the stop-list cut: terms appearing in more than that
    * many documents are dropped BEFORE their postings array
    * materializes (df is a separate tiny agg; the array agg happens
    * only for surviving terms), so one stopword can never build a
    * corpus-sized list in a single aggregation buffer. At 100 TB,
    * df-capped postings are the difference between an index and an OOM.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Long = 1000000L): DataFrame = {
    val posting = tokenRows(docs, idCol, textCol)
      .select(col("term"), col("__id")).distinct()
    val df = posting.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    posting.join(df, Seq("term"))
      .groupBy("term", "df")
      .agg(sort_array(collect_list(col("__id"))).as("postings"))
  }

  /** BM25 (the Lucene `k1`/`b` variant with the always-positive idf,
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`): top-k documents for a bag of
    * query terms. Repeated query terms are deduplicated (set-of-terms
    * semantics).
    *
    * N counts ALL corpus docs and avgdl = total tokens / N (empty docs
    * count as length 0) so the stats don't shift when empty docs churn.
    * Output: (idCol, score) — score rounded to 4 decimals (absorbs
    * cross-engine ln()/summation ulp), ties broken by id, so the top-k
    * cut is total-ordered and engine-deterministic.
    *
    * `lengths`: pass a persisted [[docLengths]] table to skip the
    * second corpus pass; defaults to computing it inline.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
           lengths: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = tokenRows(docs, idCol, textCol)
    val dl = lengths.map(_.select(col(idCol).as("__id"), col("dl")))
      .getOrElse(docLengths(docs, idCol, textCol)
        .select(col(idCol).as("__id"), col("dl")))
    // one-row corpus stats: N over docs (not dl — empty docs count),
    // avgdl = token total / N
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"))
      .crossJoin(toks.agg(count(lit(1)).cast("double").as("__ntok")))
      .select(col("__n"), (col("__ntok") / col("__n")).as("__avgdl"))
    val qTerms = terms.distinct
    val tf = toks.filter(col("term").isin(qTerms: _*))
      .groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl")))
    tf.join(dl, "__id")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("__id").as(idCol))
      .agg(round(sum(idf * norm), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion of two ranked retrieval lists — the
    * standard hybrid-search combiner (Cormack, Clarke & Buettcher,
    * SIGIR'09): a lexical list (e.g. [[bm25]]) and a dense list (e.g.
    * [[Similarity.bruteForceTopK]]) merge by RANK, not score, so the
    * two incomparable score scales never need calibration:
    *
    *   rrf(d) = Σ_lists 1/(rrfK + rank_list(d))
    *
    * over the lists that retrieved d (a miss contributes 0 — full-
    * outer semantics, realized as UNION + conditional aggregation:
    * Spark will not broadcast a full-outer join, and a sort-merge join
    * over two top-k lists would be plan noise). Ranks are dense from
    * 1 in each list, ordered by (score DESC, id ASC), so they are
    * engine-deterministic whenever the input scores are (both list
    * producers here pin their scores to round(4)/decimal(10,4)). An
    * id has AT MOST TWO contribution rows and two-term IEEE addition
    * is commutative, so the aggregated sum is deterministic with no
    * operand-order caveat; rounded to 6 dp. DUPLICATE IDS within one
    * input list are collapsed to their best (highest) score BEFORE
    * ranking — a malformed producer emitting the same document twice
    * would otherwise hold two ranks and double-count in the fusion sum
    * (and push every later document one rank down); the collapse is a
    * no-op for well-formed top-k inputs. Returns
    * `(idCol, rank_a, rank_b, rrf)` — null rank marks "not retrieved
    * by that list" — ordered by (rrf DESC, id), cut to `k`.
    *
    * Scale shape: inputs are top-k lists — PLANNING-SIZED by contract
    * (the expensive corpus work happened inside the producers). The
    * single-partition rank windows, the union hash-agg and the final
    * top-k run over ≤ |listA|+|listB| rows; nothing here touches the
    * corpus, and the plan contains no join at all.
    */
  def rrfFuse(listA: DataFrame, listB: DataFrame, idCol: String,
              k: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1, "rrfFuse: k must be >= 1")
    require(rrfK >= 1, "rrfFuse: rrfK must be >= 1")
    def ranked(df: DataFrame, src: String) = {
      val scoreCol = df.columns.filterNot(_ == idCol) match {
        case Array(s) => s
        case other => throw new IllegalArgumentException(
          s"rrfFuse: expected (id, score) columns, got ${other.mkString(",")}")
      }
      // duplicate-id guard (scaladoc): best score per id, then rank —
      // both frames are planning-sized, the extra agg is free
      df.groupBy(col(idCol)).agg(max(col(scoreCol)).as(scoreCol))
        .select(col(idCol), row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(scoreCol).desc, col(idCol)))
        .as("rank"), lit(src).as("src"))
    }
    ranked(listA, "a").unionByName(ranked(listB, "b"))
      .groupBy(col(idCol))
      .agg(min(when(col("src") === "a", col("rank"))).as("rank_a"),
        min(when(col("src") === "b", col("rank"))).as("rank_b"),
        round(sum(lit(1.0) / (lit(rrfK) + col("rank"))), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** nDCG@k — the graded ranking-quality metric over a multi-query run
    * (search eval, hard-negative miner QA, retrieval A/B): per query,
    * DCG@k = Σ_{i≤k} (2^rel_i − 1)/log2(i+1) over the run's rank
    * order, normalized by the ideal DCG from that query's best-possible
    * ordering of its judged documents. Run rows beyond rank k and
    * unjudged documents (rel defaults to 0) contribute nothing; queries
    * with NO positively-judged document have IDCG = 0 and are DROPPED
    * (nDCG is undefined there — dropping is the standard macro
    * convention, and silent 0s would drag the mean).
    *
    * Scale shape: run and qrels are (query, doc, …) tables of
    * per-query top-k lists / judgment sets — every window here is
    * PARTITIONED BY the query column (ranks within one query's ≤k-row
    * slice), the run↔qrels join is an equi-join on (query, doc), and
    * the per-query DCG/IDCG folds are hash aggs. Millions of queries
    * scale out on the query key; nothing is global.
    *
    * Returns `(queryCol, dcg, idcg, ndcg)` sorted by query.
    */
  def ndcgAtK(run: DataFrame, qrels: DataFrame, queryCol: String,
              idCol: String, rankCol: String, relCol: String,
              k: Int): DataFrame = {
    require(k >= 1, "ndcgAtK: k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
    def lg2(c: org.apache.spark.sql.Column) = log(c) / log(lit(2.0))
    val gain = (pow(lit(2.0), col("rel")) - 1.0) / lg2(col("pos") + 1.0)
    // run side: re-rank defensively inside each query (ties in the
    // producer's rank column would otherwise double-count a position),
    // cut to k, left-join judgments, unjudged rel = 0
    val dcg = run
      .select(col(queryCol).as("q"), col(idCol).as("d"), col(rankCol).as("r"))
      .withColumn("pos", row_number().over(
        w.partitionBy(col("q")).orderBy(col("r"), col("d"))))
      .filter(col("pos") <= k)
      .join(qrels.select(col(queryCol).as("q"), col(idCol).as("d"),
          col(relCol).cast("double").as("rel")),
        Seq("q", "d"), "left")
      .na.fill(0.0, Seq("rel"))
      .groupBy(col("q")).agg(sum(gain).as("dcg"))
    // ideal side: each query's judged docs by rel desc (doc id breaks
    // ties — any tie order yields the same IDCG), top k
    val idcg = qrels
      .select(col(queryCol).as("q"), col(idCol).as("d"),
        col(relCol).cast("double").as("rel"))
      .filter(col("rel") > 0.0)
      .withColumn("pos", row_number().over(
        w.partitionBy(col("q")).orderBy(col("rel").desc, col("d"))))
      .filter(col("pos") <= k)
      .groupBy(col("q")).agg(sum(gain).as("idcg"))
    dcg.join(idcg, Seq("q")) // inner: IDCG=0 queries drop (scaladoc)
      .select(col("q").as(queryCol), col("dcg"), col("idcg"),
        (col("dcg") / col("idcg")).as("ndcg"))
      .orderBy(col(queryCol))
  }
}
