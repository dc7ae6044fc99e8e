package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The per-round lineage-cut discipline every iterative graph operator
  * here shares (PageRank / TrustRank / label propagation): each round's
  * frame must be cut or the plan doubles per iteration (2^n blowup).
  *
  *  - RELIABLE mode (a cluster checkpoint dir is configured): persist
  *    BEFORE the eager `checkpoint(true)` so the checkpoint's write job
  *    reads the cache instead of recomputing the round's joins, and
  *    release the PREVIOUS round's cache only once the new frame is on
  *    stable storage — the executor-loss-safe path.
  *  - LOCAL mode: a LAZY `localCheckpoint(false)` mark; the next
  *    round's (or caller's) action materializes it, so each round runs
  *    exactly the jobs it needs and no more.
  *
  * One instance per operator invocation (it carries the previous-round
  * cache handle). Call [[release]] after the final frame is
  * materialized.
  */
private[operators] final class RoundCheckpointer(val reliable: Boolean) {
  private var prevCached: Option[DataFrame] = None

  def apply(df: DataFrame): DataFrame =
    if (reliable) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint(true)
      prevCached.foreach(_.unpersist())
      prevCached = Some(df)
      out
    } else df.localCheckpoint(false)

  /** Release the last round's cache — only after the caller has
    * materialized everything derived from it. */
  def release(): Unit = {
    prevCached.foreach(_.unpersist())
    prevCached = None
  }
}
