package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for persisted shared subtrees.
  *
  * Query builders that reuse a subtree (shingle tables, exploded
  * tokens) persist it so one pass feeds several joins — but a builder
  * returns a LAZY DataFrame, so the builder can never know when the
  * caller's terminal action has run; unpersisting inside the builder
  * would recompute the subtree instead of sharing it. The contract:
  * builders pin through [[materialize]]; whoever runs the action
  * (Verify/Bench per query, a long-lived service per unit of work)
  * calls [[releaseAll]] afterwards, so pinned storage never outlives
  * the query that pinned it.
  */
object Shared {

  private val reg = scala.collection.mutable.Map.empty[SparkSession, List[DataFrame]]

  /** Persist `df` (MEMORY_AND_DISK) and track it for release. */
  def materialize(df: DataFrame): DataFrame = synchronized {
    val s = df.sparkSession
    reg.update(s, df :: reg.getOrElse(s, Nil))
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every subtree materialized on `spark` since the last
    * release (non-blocking: executors drop blocks asynchronously, but
    * the CacheManager entry is gone on return).
    */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    reg.remove(spark).foreach(_.foreach(_.unpersist(false)))
  }
}
