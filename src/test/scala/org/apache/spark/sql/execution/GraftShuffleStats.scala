package org.apache.spark.sql.execution

import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Test-only bridge into `private[spark]` shuffle statistics: per-
  * partition output bytes of a finished AQE shuffle stage, the signal
  * PlanQualitySpec uses to detect parallelism funnels (a corpus-sized
  * exchange whose rows land in only a handful of partitions — invisible
  * to plan-string checks because the partition COUNT looks healthy).
  */
object GraftShuffleStats {
  def bytesByPartition(s: ShuffleQueryStageExec): Option[Array[Long]] =
    s.mapStats.map(_.bytesByPartitionId)
}
