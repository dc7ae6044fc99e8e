package org.apache.spark

/** Test-only escape hatch: SparkContext has no public way to UNSET a
  * checkpoint dir, but the reliable-checkpoint spec must restore the
  * shared test session to the local-checkpoint default so later suites
  * aren't silently flipped onto the reliable branch. `checkpointDir`
  * is private[spark], hence this file's package.
  */
object GraftTestSparkAccess {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
