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

  /** Scope mark: the number of frames currently pinned on `spark`.
    * Pair with [[releaseSince]] so a library step that pins
    * intermediates can release exactly its own — a blanket
    * [[releaseAll]] from inside a library method would also unpin
    * whatever the CALLER had materialized (a session-global side
    * effect the round-9 advice flagged in the streaming screen).
    */
  def mark(spark: SparkSession): Int = synchronized {
    reg.getOrElse(spark, Nil).length
  }

  /** Unpersist only the frames pinned on `spark` after `mark` was
    * taken; anything pinned before stays registered and cached.
    */
  def releaseSince(spark: SparkSession, mark: Int): Unit = synchronized {
    val cur = reg.getOrElse(spark, Nil)
    val keep = cur.takeRight(mark)
    cur.dropRight(mark).foreach(_.unpersist(false))
    if (keep.isEmpty) reg.remove(spark) else reg.update(spark, keep)
  }
}
