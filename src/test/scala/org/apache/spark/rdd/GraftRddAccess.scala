package org.apache.spark.rdd

/** Test-only escape hatch: `RDD.isLocallyCheckpointed` is
  * private[rdd], and the persist-discipline specs need to EXCLUDE
  * localCheckpoint marks (round-cut frames left to the ContextCleaner)
  * when counting a test's own explicit persists. */
object GraftRddAccess {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
