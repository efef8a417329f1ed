package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance lifecycle for the ingest-partitioned screening catalogs
  * ([[DedupCatalog]], [[VecCatalog]]): compaction and retention.
  *
  * The catalogs grow one `ingest_id` partition per accepted batch — at
  * production cadence that is thousands of small partitions/files per
  * table, which degrades both the metastore (partition listing per
  * query) and the scan (file-open amortization). The reference actually
  * maintains its state: `honeycomb/owt/cleanUp.py:11-57` deletes aged
  * state recursively and `hcOwt.py:250-331` archives processed batches
  * before advancing. This module is that lifecycle for the landed
  * catalogs:
  *
  *  - [[compact]]: fold ingest partitions `0..upTo` into a single
  *    partition 0 (same bucketing — the rewrite goes through the
  *    table's bucket spec, so co-located candidate joins stay
  *    shuffle-free afterwards). Screen verdicts are IDENTICAL before
  *    and after: the fold is a pure layout change over the same rows.
  *  - [[expire]]: drop ingest partitions below a cutoff entirely
  *    (age/count retention — that state is deliberately forgotten,
  *    the `cleanUp.py` analog).
  *
  * Both raise the catalog's FLOOR (persisted in `_FLOOR` under the
  * catalog root): appends at or below the floor are rejected — a
  * crash-replayed batch whose partition was folded away must NOT
  * re-append (its rows are already inside partition 0; duplicating
  * them would inflate the screen's intersection counts — corruption,
  * not mere duplication), and an expired batch must not resurrect.
  * Screens bounded below the floor are likewise rejected loudly
  * ([[DedupCatalog.screen]]): after a fold the bound cannot be
  * honored (partition 0 now contains later batches), so failing beats
  * silently self-matching. Callers therefore compact/expire only up to
  * checkpoint-COMMITTED batch ids — committed batches never replay.
  *
  * Crash safety: a `_MAINT` marker (intent + cutoff) is written before
  * any destructive step and removed after the floor advances; [[recover]]
  * (called from the catalogs' re-register path) re-runs an interrupted
  * operation. The fold itself is idempotent: re-folding
  * already-folded partitions is a `distinct()` no-op because every
  * catalog table is set-semantic per doc (bands/shingles/sizes and
  * bucket-keys/vectors all carry one row per distinct key).
  */
object CatalogMaintenance {

  /** One catalog's physical layout: parallel lists of table names and
    * their data directories, plus the root where markers live.
    */
  case class TableSet(tables: Seq[String], dataDirs: Seq[String], root: String)

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  /** Regen hygiene for FINGERPRINT-NAMED catalogs — the
    * [[graft.Shared.pruneSiblings]] discipline applied to landed
    * catalog state: every driver-side testdata regeneration mints a
    * new content fingerprint, so a catalog named by one strands its
    * previous incarnation (tables + a corpus-sized data tree under
    * `base`) forever unless the new landing prunes it.
    *
    * Drops every catalog root under `base` whose directory name
    * starts with `dirTag + "_" + sanitized(namePrefix)` EXCEPT the
    * one whose logical name is `keepName`, along with the
    * spark-catalog table entries pointing at the deleted roots
    * (table names are `<root-dir-name>_<suffix>` across all catalog
    * kinds). Callers pass a prefix that pins the gate AND the scale
    * dir, so a prune from one scale can never victimize another's
    * live catalog.
    *
    * AGE-GUARDED (the [[graft.Shared.gcStaleSiblings]] discipline,
    * round-19 advice): only siblings whose NEWEST file is older than
    * `maxAgeMs` are deleted. Two concurrent processes on the same
    * gate mid-regen hold different content fingerprints; without the
    * guard each would delete the other's freshly-built, in-use
    * catalog mid-query. A just-built sibling is recent by
    * construction, so it survives both prunes; genuinely stale
    * incarnations (previous regens) age past the threshold and get
    * collected by whichever session prunes next.
    */
  private[graft] def pruneCatalogSiblings(spark: SparkSession, base: String,
      dirTag: String, namePrefix: String, keepName: String,
      maxAgeMs: Long = 2L * 3600 * 1000): Unit = {
    def san(s: String) = s.replaceAll("[^A-Za-z0-9_]", "_")
    val prefix = s"${dirTag}_${san(namePrefix)}"
    val keepDir = s"${dirTag}_${san(keepName)}_" +
      java.lang.Long.toHexString(graft.functions.TextImpl.fnv1a64(keepName)).take(8)
    val baseP = new Path(base)
    val f = fs(spark, base)
    if (!f.exists(baseP)) return
    val cutoff = System.currentTimeMillis() - maxAgeMs
    def newestMtime(p: Path, own: Long): Long = {
      var newest = own
      val it = f.listFiles(p, true)
      while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
      newest
    }
    val stale = f.listStatus(baseP)
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith(prefix) && n != keepDir &&
          st.getModificationTime < cutoff &&
          scala.util.Try(newestMtime(st.getPath, st.getModificationTime))
            .getOrElse(Long.MaxValue) < cutoff
      }
      .map(_.getPath.getName)
    stale.foreach { n =>
      spark.sessionState.catalog
        .listTables("default", s"$n*").foreach { ti =>
          spark.sql(s"DROP TABLE IF EXISTS ${ti.table}")
        }
      f.delete(new Path(base, n), true)
    }
  }

  private[graft] def readFile(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        Some(out.toString("UTF-8").trim)
      } finally in.close()
    }

  private[graft] def writeFile(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def floorPath(root: String) = new Path(s"$root/_FLOOR")
  private def maintPath(root: String) = new Path(s"$root/_MAINT")

  /** The catalog's maintenance floor: the highest ingest id that has
    * been folded or expired away. Appends must be > floor; screen
    * bounds must be >= floor. 0 when no maintenance has ever run
    * (ingest ids start at 1; 0 is the landing).
    */
  def readFloor(spark: SparkSession, root: String): Long =
    readFile(fs(spark, root), floorPath(root))
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)

  private def writeFloor(spark: SparkSession, root: String, v: Long): Unit =
    writeFile(fs(spark, root), floorPath(root), v.toString)

  /** Ingest partition ids currently present under a table's data dir
    * (listed from the FILES, not the metastore — recovery must see
    * partitions whose catalog entry is gone or stale).
    */
  private def partitionIds(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("ingest_id="))
      .flatMap(n => scala.util.Try(n.stripPrefix("ingest_id=").toLong).toOption)
  }

  /** Drop one ingest partition: catalog metadata first, then files
    * (external tables keep files on DROP PARTITION). A crash between
    * the two leaves files an MSCK could resurrect — which is why
    * [[recover]] re-runs the whole operation from the `_MAINT` marker
    * after any re-register.
    */
  private def dropPartition(spark: SparkSession, table: String, dir: String,
      id: Long): Unit = {
    spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (ingest_id=$id)")
    fs(spark, dir).delete(new Path(dir, s"ingest_id=$id"), true)
  }

  private def runCompact(spark: SparkSession, ts: TableSet, upTo: Long): Unit =
    ts.tables.zip(ts.dataDirs).foreach { case (t, dir) =>
      val dataCols = spark.table(t).columns.filterNot(_ == "ingest_id")
      // distinct() makes a partial-fold replay idempotent (a crashed
      // compact may have folded some tables already: partition 0 then
      // holds the union, and re-reading 0..upTo would double rows);
      // eager localCheckpoint cuts the plan from the files the
      // overwrite is about to replace (at cluster scale this would be
      // a reliable checkpoint dir — same contract, durable storage)
      val folded = spark.table(t).filter(col("ingest_id") <= upTo)
        .select(dataCols.map(col): _*).distinct()
        .withColumn("ingest_id", lit(0L))
        .localCheckpoint(true)
      BucketedLayout.overwritePartitions(spark, folded, t)
      partitionIds(spark, dir).filter(id => id > 0 && id <= upTo)
        .foreach(id => dropPartition(spark, t, dir, id))
    }

  /** Fold ingest partitions 0..`upTo` into partition 0 and raise the
    * floor. Idempotent: a cutoff at or below the current floor is a
    * no-op (the gate query re-runs its lifecycle once per session).
    */
  def compact(spark: SparkSession, ts: TableSet, upTo: Long): Unit = {
    require(upTo > 0, s"compact cutoff must be > 0: $upTo")
    if (upTo <= readFloor(spark, ts.root)) return
    writeFile(fs(spark, ts.root), maintPath(ts.root), s"compact=$upTo")
    runCompact(spark, ts, upTo)
    writeFloor(spark, ts.root, upTo)
    fs(spark, ts.root).delete(maintPath(ts.root), false)
  }

  private def runExpire(spark: SparkSession, ts: TableSet, minId: Long,
      archiveDir: Option[String]): Unit =
    ts.tables.zip(ts.dataDirs).foreach { case (t, dir) =>
      partitionIds(spark, dir).filter(_ < minId).foreach { id =>
        archiveDir.foreach { a =>
          // archive-then-advance (hcOwt.py:250-331's discipline): the
          // partition's files are COPIED to the archive before the
          // drop, so aged state is demoted to cold storage, not lost.
          // Copy-then-delete (not rename) keeps the drop idempotent
          // under marker recovery — a re-run overwrites the same
          // archive paths and re-deletes.
          val conf = spark.sessionState.newHadoopConf()
          val srcFs = fs(spark, dir)
          val src = new Path(dir, s"ingest_id=$id")
          val dstDir = new Path(s"$a/${dir.split('/').last}/ingest_id=$id")
          val dstFs = dstDir.getFileSystem(conf)
          if (srcFs.exists(src))
            org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dstDir,
              false, true, conf)
        }
        dropPartition(spark, t, dir, id)
      }
    }

  /** Retention: drop every ingest partition below `minIngestId`
    * (including the landing, partition 0, if minIngestId > 0) and
    * raise the floor to `minIngestId - 1` so expired batch ids can
    * never be re-appended. The age→id mapping is the caller's (batch
    * ids are monotone in arrival time, so an age cutoff IS an id
    * cutoff).
    *
    * @param archiveDir with Some(dir), each partition's files are
    *   copied under `dir/<table-suffix>/ingest_id=<n>` before the
    *   drop (readable as bare parquet) — retention demotes to cold
    *   storage instead of deleting.
    */
  def expire(spark: SparkSession, ts: TableSet, minIngestId: Long,
      archiveDir: Option[String] = None): Unit = {
    require(minIngestId > 0, s"retention cutoff must be > 0: $minIngestId")
    if (minIngestId - 1 <= readFloor(spark, ts.root) &&
        ts.dataDirs.forall(d => partitionIds(spark, d).forall(_ >= minIngestId)))
      return
    // the marker intentionally omits the archive dir: recovery re-runs
    // the DROPS (idempotent); a crash mid-archive re-copies nothing in
    // the next explicit expire call, so callers that need the archive
    // guarantee re-issue expire with the same archiveDir after a crash
    writeFile(fs(spark, ts.root), maintPath(ts.root), s"expire=$minIngestId")
    runExpire(spark, ts, minIngestId, archiveDir)
    writeFloor(spark, ts.root,
      math.max(readFloor(spark, ts.root), minIngestId - 1))
    fs(spark, ts.root).delete(maintPath(ts.root), false)
  }

  /** Finish an interrupted compact/expire (called after re-register in
    * a fresh session): re-runs the marked operation — both are
    * idempotent — then advances the floor and clears the marker.
    */
  def recover(spark: SparkSession, ts: TableSet): Unit =
    readFile(fs(spark, ts.root), maintPath(ts.root)).foreach { m =>
      m.split("=", 2) match {
        case Array("compact", v) =>
          val upTo = v.toLong
          runCompact(spark, ts, upTo)
          writeFloor(spark, ts.root, math.max(readFloor(spark, ts.root), upTo))
        case Array("expire", v) =>
          val minId = v.toLong
          runExpire(spark, ts, minId, None)
          writeFloor(spark, ts.root,
            math.max(readFloor(spark, ts.root), minId - 1))
        case other =>
          throw new IllegalStateException(
            s"unrecognized _MAINT marker '${other.mkString("=")}' at ${ts.root}")
      }
      fs(spark, ts.root).delete(maintPath(ts.root), false)
    }
}
