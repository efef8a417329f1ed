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

  /** Content fingerprint of a source-table directory: a short stable
    * hash over the (name, length, mtime) of its files. Landing paths
    * derived from a scale dir embed this, so a DRIVER-side testdata
    * regeneration can never pair a stale `/tmp` landing with fresh
    * source parquet (the landing's `_SUCCESS`-gated idempotence would
    * otherwise happily serve the old corpus). Pure FileSystem listing,
    * no Spark job.
    */
  def srcFingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val listing = fs.listStatus(p).sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString("|")
    f"${scala.util.hashing.MurmurHash3.stringHash(listing)}%08x"
  }

  /** Regen hygiene for fingerprint-suffixed landings: delete every
    * sibling under `parentDir` that shares `prefix` but is not
    * `keepName` — otherwise each testdata regeneration strands a full
    * corpus copy in tmp forever.
    */
  def pruneSiblings(spark: SparkSession, parentDir: String, prefix: String,
      keepName: String): Unit = {
    val parent = new org.apache.hadoop.fs.Path(parentDir)
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n != keepName) fs.delete(st.getPath, true)
      }
  }

  /** GC for per-process gate leftovers (streaming replay gates key
    * their sink/checkpoint dirs by pid): delete every sibling of
    * `keepName` under `parentDir` matching `prefix` whose NEWEST
    * recursive mtime is older than `maxAgeMs`. The top-level dir's
    * own mtime is NOT enough: POSIX directory mtime only changes when
    * a direct child is added/removed, so a live stream writing under
    * nested ck/offsets for hours looks idle at the top — staleness
    * must be judged by the newest timestamp anywhere in the tree.
    * Gate dirs are small (one sink + one checkpoint), so the
    * recursive listing is bounded.
    */
  def gcStaleSiblings(spark: SparkSession, parentDir: String, prefix: String,
      keepName: String, maxAgeMs: Long = 2L * 3600 * 1000): Unit = {
    val parent = new org.apache.hadoop.fs.Path(parentDir)
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    val cutoff = System.currentTimeMillis() - maxAgeMs
    def newestMtime(p: org.apache.hadoop.fs.Path, own: Long): Long = {
      var newest = own
      val it = fs.listFiles(p, true)
      while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
      newest
    }
    if (fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n != keepName &&
            st.getModificationTime < cutoff &&
            scala.util.Try(newestMtime(st.getPath, st.getModificationTime))
              .getOrElse(Long.MaxValue) < cutoff)
          fs.delete(st.getPath, true)
      }
  }

  /** Scope mark: an identity snapshot of the frames currently pinned
    * on `spark`. Pair with [[releaseSince]] so a library step that
    * pins intermediates can release exactly its own — a blanket
    * [[releaseAll]] from inside a library method would also unpin
    * whatever the CALLER had materialized (a session-global side
    * effect the round-9 advice flagged in the streaming screen).
    *
    * Identity-based, not count-based: with a plain length mark,
    * another thread pinning on the same session between a library's
    * mark() and its releaseSince() would shift the count, and the
    * CALLER's frames (counted as "since the mark") would get
    * unpersisted while the library's own stayed pinned. The snapshot
    * makes releaseSince precise under interleaving.
    */
  def mark(spark: SparkSession): List[DataFrame] = synchronized {
    reg.getOrElse(spark, Nil)
  }

  /** Unpersist only the frames pinned on `spark` that were NOT in the
    * `mark` snapshot (reference identity); anything pinned before —
    * or by another thread and present at mark time — stays registered
    * and cached.
    */
  def releaseSince(spark: SparkSession, mark: List[DataFrame]): Unit = synchronized {
    val marked = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    mark.foreach(marked.add)
    val (keep, release) = reg.getOrElse(spark, Nil).partition(marked.contains)
    release.foreach(_.unpersist(false))
    if (keep.isEmpty) reg.remove(spark) else reg.update(spark, keep)
  }
}
