package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge — apply a batch of keyed change rows onto a base snapshot:
  * the `MERGE INTO` / upsert shape every metadata-catalog and
  * warehouse-ingest loop needs (the reference's cron re-push job is
  * exactly a snapshot refresher; this is the incremental form of it).
  *
  * Change rows carry the key columns, the new payload, an op column
  * (`I` insert / `U` update / `D` delete — I and U are both
  * "upsert wins") and a monotone sequence column; when a batch holds
  * several changes for one key, the highest sequence wins. The caller
  * must make (key, seq) unique — `max_by` on a tied seq would be
  * nondeterministic, so ties are the one contract violation.
  *
  * Shape at scale: the change batch (small: one CDC window) collapses
  * to one row per key with a single partial-aggregated `max_by` hash
  * agg — the base table is NEVER aggregated or windowed. The base then
  * anti-joins the touched-key set (AQE broadcasts it when small, the
  * usual case) and the surviving change payloads union on. Total
  * movement: one agg of the batch + one join of base against |keys|
  * rows. No full-outer join, no window over base.
  */
object MergeUpsert {

  def applyCdc(base: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyCdc: need at least one key column")
    val payload = changes.columns.filterNot(keys.contains).toSeq
    require(payload.contains(opCol) && payload.contains(seqCol),
      s"applyCdc: changes must carry '$opCol' and '$seqCol' columns")
    val latest = changes.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(seqCol)).as("_ch"))
      .select(keys.map(col) ++ payload.map(p => col(s"_ch.$p").as(p)): _*)
    val untouched =
      base.join(latest.select(keys.map(col): _*), keys, "left_anti")
    val applied = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
    untouched.unionByName(applied)
  }

  /** SCD Type-2 history build — turn an append-only keyed change log
    * into versioned dimension rows with validity intervals: one row per
    * EFFECTIVE state change, `[valid_from_seq, valid_to_seq)` half-open
    * on the change sequence, `valid_to_seq` null + `is_current` true on
    * the latest version. Consecutive changes that repeat the previous
    * state (CDC echoes, full-row re-pushes — the reference's cron
    * re-push emits exactly these) collapse into the earlier version.
    *
    * Contract: (keys, seqCol) unique, seqCol monotone in change order
    * (a CDC LSN / commit timestamp).
    *
    * Shape at scale: one shuffle on the key, then lag (drop no-ops) and
    * lead (close intervals) run over the SAME (key, seq) sort — the
    * filter between them preserves partitioning and order, so Spark
    * plans one Exchange + one Sort for both windows (PlanSpec-locked).
    * Per-key state is the window row buffer, never the history.
    */
  def scd2History(changes: DataFrame, keys: Seq[String], seqCol: String,
                  stateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd2History: need at least one key column")
    require(stateCols.nonEmpty, "scd2History: need at least one state column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    val state = struct(stateCols.map(col): _*)
    changes
      .withColumn("__prev", lag(state, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> state))
      .withColumn("valid_from_seq", col(seqCol))
      .withColumn("valid_to_seq", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to_seq").isNull)
      .select((keys ++ stateCols).map(col) ++
        Seq(col("valid_from_seq"), col("valid_to_seq"), col("is_current")): _*)
  }

  /** Point-in-time (time-travel) read of an [[scd2History]] table: the
    * state of every key AS OF sequence point `atSeq` — the row whose
    * validity interval covers it. Keys whose first change is later
    * than `atSeq` are absent (they did not exist yet). A plain
    * predicate on the two interval columns: pushes to the history
    * table's scan, prunes partitions if the history is stored
    * partitioned by a validity-derived column, costs one filtered
    * read — the query shape every warehouse time-travel feature
    * compiles to. */
  def scd2AsOf(history: DataFrame, atSeq: Long): DataFrame =
    history.filter(col("valid_from_seq") <= atSeq &&
        (col("valid_to_seq").isNull || col("valid_to_seq") > atSeq))
      .drop("valid_from_seq", "valid_to_seq", "is_current")

  /** Structural invariant audit of an SCD2 history — the check a
    * pipeline runs after every merge into a hand-maintained history
    * table (a [[scd2History]] build satisfies it by construction; a
    * concurrent writer or a botched backfill breaks it silently):
    * per key, exactly ONE open (is_current) row, and the validity
    * intervals CHAIN — each row's valid_to equals the next row's
    * valid_from, with only the last row open. One key-windowed pass;
    * output is a single row of violation counts (all zero = healthy).
    */
  def scd2Audit(history: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("valid_from_seq"))
    val chained = history
      .withColumn("__next_from", lead(col("valid_from_seq"), 1).over(w))
      .withColumn("__chain_bad",
        when(col("__next_from").isNull, // last row: must be open
          when(col("valid_to_seq").isNotNull, 1L).otherwise(0L))
        .otherwise( // interior row: must close exactly at the next open
          when(!(col("valid_to_seq") <=> col("__next_from")), 1L).otherwise(0L)))
    val perKey = chained
      .groupBy(keys.map(col): _*)
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("__n_cur"),
        sum(col("__chain_bad")).as("__n_chain"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(when(col("__n_cur") =!= 1L, 1L).otherwise(0L)).as("bad_current_keys"),
      coalesce(sum(col("__n_chain")), lit(0L)).as("broken_chain_rows"))
  }
}
