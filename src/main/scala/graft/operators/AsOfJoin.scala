package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY §2.B X9 / declared query Q22.
  *
  * Spark has no native ASOF join; the classic scalable encoding is the
  * union + running-max trick used here:
  *
  *   1. union the right rows (tagged 0) and left rows (tagged 1) into
  *      one stream keyed by the join key;
  *   2. window PARTITION BY key ORDER BY (time, tag): a running `max`
  *      over struct(rightTime, tieBreak…, payload…) gives, at each left
  *      row, the latest right row with rightTime ≤ leftTime — struct
  *      comparison is lexicographic, so ties on rightTime resolve to
  *      the greatest tie-break, matching the Q22 contract;
  *   3. keep the left rows, unpack the matched struct.
  *
  * Cost: ONE shuffle on the key + a per-partition sort — no range
  * cross-join blowup, no per-key collect. At 100 TB this is the same
  * shape as a sort-merge join; heavy keys can be pre-salted by date
  * bucketing if a single key's timeline exceeds one task's memory
  * (sorting spills, so it degrades gracefully rather than OOMing).
  */
object AsOfJoin {

  /** For each left row, attach `payload` columns of the right row with
    * the greatest `rightTime <= leftTime` for the same key (ties on
    * rightTime → greatest payload tuple). Rows with no match get null.
    *
    * @param payload right-side columns carried to the output; their
    *                order is also the tie-break order after rightTime.
    */
  def asOf(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val matchType = struct(col(rightTime) +: payload.map(col): _*)

    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
      matchType.as("__m"),
      lit(null).cast(left.schema).as("__l"))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
      lit(null).cast(r.schema("__m").dataType).as("__m"),
      struct(leftCols.map(col): _*).as("__l"))

    // right rows sort before left rows at equal time → `<=` semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__best", max(col("__m")).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        (rightTime +: payload).map(c => col(s"__best.$c")): _*)
  }
}
