package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{DedupCatalog, VecCatalog}

/** Catalog maintenance lifecycle: compaction must be a pure LAYOUT
  * change (screen verdicts identical, partition/file count drops),
  * retention must actually forget state, floors must reject replays of
  * folded/expired batches, an interrupted operation must complete from
  * its marker on reattach, and the persisted bucket count must win
  * over a mismatched re-register parameter.
  */
class CatalogMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir).select("doc_id", "text")

  private def evens(lo: Int, hi: Int) =
    docs.filter(col("doc_id") % 2 === 0 && col("doc_id") >= lo && col("doc_id") < hi)

  /** Odd docs planted as near-dups of their even twins (the standard
    * fixture shape): twins of docs across the landing AND the appended
    * ranges, so verdict equality spans every folded partition.
    */
  private def probe = {
    val twin = docs.select((col("doc_id") + 1).as("doc_id"), col("text").as("h_text"))
    docs.filter(col("doc_id") % 2 === 1)
      .join(twin, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("h_text"), lit(" zz")))
          .otherwise(col("text")).as("text"))
  }

  private def ingestDirs(root: String, sfx: String): Seq[String] = {
    val p = new Path(s"$root/$sfx")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("ingest_id="))
  }

  test("compact folds partitions without changing screen verdicts; floors reject replays") {
    val cat = DedupCatalog.land(spark, evens(0, 300), "maint_compact")
    try {
      DedupCatalog.append(spark, evens(300, 400), cat, ingestId = 1)
      DedupCatalog.append(spark, evens(400, 500), cat, ingestId = 2)
      val before = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      assert(before.nonEmpty, "no planted verdicts before compaction")
      assert(ingestDirs(cat.root, "bands").size === 3)

      DedupCatalog.compact(spark, cat, upToIngestId = 2)
      val after = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      assert(after.map(_.toString) === before.map(_.toString),
        "compaction changed screen verdicts")
      assert(ingestDirs(cat.root, "bands") === Seq("ingest_id=0"),
        s"bands partitions not folded: ${ingestDirs(cat.root, "bands")}")
      assert(ingestDirs(cat.root, "shingles") === Seq("ingest_id=0"))
      assert(DedupCatalog.floor(spark, cat) === 2L)

      // replay of a compacted-away batch id must be rejected — its rows
      // already live in partition 0
      intercept[IllegalArgumentException] {
        DedupCatalog.append(spark, evens(300, 400), cat, ingestId = 1)
      }
      // a screen bound below the floor can no longer be honored
      intercept[IllegalArgumentException] {
        DedupCatalog.screen(spark, probe, cat, maxIngestId = Some(1L))
      }
      // re-compacting at or below the floor is a no-op (gate re-runs)
      DedupCatalog.compact(spark, cat, upToIngestId = 2)
      // the ingest loop continues above the floor; the new batch is
      // content-disjoint (unique md5 tokens) so verdicts are unchanged
      DedupCatalog.append(spark, evens(300, 400)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat_ws(" ", (1 to 6).map(i =>
            md5(concat(col("doc_id"), lit(s"|u$i")))): _*).as("text")),
        cat, ingestId = 3)
      val cont = DedupCatalog.screen(spark, probe, cat, maxIngestId = Some(3L))
        .collect().toSeq
      Shared.releaseAll(spark)
      assert(cont.map(_.toString) === before.map(_.toString),
        "post-compaction append broke the screen")
    } finally DedupCatalog.drop(spark, cat)
  }

  test("expire forgets aged state and blocks resurrection") {
    val cat = DedupCatalog.land(spark, evens(0, 100), "maint_expire")
    try {
      DedupCatalog.append(spark, evens(100, 300), cat, ingestId = 1)
      val before = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      assert(before.exists(_.getLong(2) < 100L),
        "fixture has no verdict matching the landing")
      assert(before.exists(_.getLong(2) >= 100L),
        "fixture has no verdict matching the appended batch")

      // age out the landing (partition 0): its docs are forgotten
      DedupCatalog.expire(spark, cat, minIngestId = 1)
      val after = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      assert(after.nonEmpty && after.forall(_.getLong(2) >= 100L),
        s"expired landing still matched: ${after.filter(_.getLong(2) < 100L)}")
      assert(ingestDirs(cat.root, "bands") === Seq("ingest_id=1"))

      // age out batch 1 too; floor rises and re-appending id 1 is blocked
      DedupCatalog.expire(spark, cat, minIngestId = 2)
      assert(DedupCatalog.floor(spark, cat) === 1L)
      intercept[IllegalArgumentException] {
        DedupCatalog.append(spark, evens(100, 300), cat, ingestId = 1)
      }
      val none = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      assert(none.isEmpty, s"fully expired catalog still matched: $none")
    } finally DedupCatalog.drop(spark, cat)
  }

  test("expire with an archive dir demotes partitions to cold storage before dropping") {
    import spark.implicits._
    val cat = DedupCatalog.land(spark, evens(0, 100), "maint_archive")
    val arch = java.nio.file.Files.createTempDirectory("maint_arch").toString
    try {
      DedupCatalog.append(spark, evens(100, 300), cat, ingestId = 1)
      val sizesBefore = spark.table(cat.sizesT)
        .filter(col("ingest_id") === 0).select("doc").as[Long].collect().toSet
      DedupCatalog.expire(spark, cat, minIngestId = 1, archiveDir = Some(arch))
      // forgotten by the catalog…
      assert(ingestDirs(cat.root, "sizes") === Seq("ingest_id=1"))
      // …but readable as bare parquet from the archive, row-for-row
      val archived = spark.read.parquet(s"$arch/sizes/ingest_id=0")
        .select("doc").as[Long].collect().toSet
      assert(archived === sizesBefore,
        s"archive lost rows: ${(sizesBefore -- archived).take(5)}")
    } finally {
      DedupCatalog.drop(spark, cat)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(arch))
    }
  }

  test("an interrupted compact completes from its marker on reattach") {
    val cat = DedupCatalog.land(spark, evens(0, 300), "maint_recover")
    try {
      DedupCatalog.append(spark, evens(300, 400), cat, ingestId = 1)
      DedupCatalog.append(spark, evens(400, 500), cat, ingestId = 2)
      val before = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      // simulate a crash between writing the intent marker and the
      // fold: the marker exists, nothing was folded, the session died
      val fs = new Path(cat.root).getFileSystem(spark.sessionState.newHadoopConf())
      graft.plans.CatalogMaintenance.writeFile(fs,
        new Path(s"${cat.root}/_MAINT"), "compact=2")
      Seq(cat.bandsT, cat.shinglesT, cat.sizesT)
        .foreach(t => spark.sql(s"DROP TABLE $t"))
      // reattach runs recovery: the fold completes, the floor advances
      val cat2 = DedupCatalog.land(spark, evens(0, 300), "maint_recover")
      assert(!fs.exists(new Path(s"${cat.root}/_MAINT")), "marker not cleared")
      assert(DedupCatalog.floor(spark, cat2) === 2L)
      assert(ingestDirs(cat2.root, "bands") === Seq("ingest_id=0"))
      val after = DedupCatalog.screen(spark, probe, cat2).collect().toSeq
      Shared.releaseAll(spark)
      assert(after.map(_.toString) === before.map(_.toString),
        "recovered compaction changed screen verdicts")
    } finally DedupCatalog.drop(spark, cat)
  }

  test("re-register uses the persisted bucket count, not the call-site parameter") {
    val hist = evens(0, 300)
    val cat = DedupCatalog.land(spark, hist, "maint_nbuckets", nBuckets = 4)
    try {
      val before = DedupCatalog.screen(spark, probe, cat).collect().toSeq
      Shared.releaseAll(spark)
      Seq(cat.bandsT, cat.shinglesT, cat.sizesT)
        .foreach(t => spark.sql(s"DROP TABLE $t"))
      // restart path called with the DEFAULT bucket count (8): the
      // files were written with 4 — a re-register at 8 would make the
      // bucketed scan silently drop files with bucket id >= 8... with
      // 4-bucket files it is the join co-partitioning that breaks;
      // either way the persisted value must win
      val cat2 = DedupCatalog.land(spark, hist, "maint_nbuckets")
      val desc = spark.sql(s"DESCRIBE FORMATTED ${cat2.bandsT}").collect()
        .map(_.mkString(" ")).mkString("\n")
      assert(desc.contains("Num Buckets") && desc.contains("4"),
        s"re-registered bucket spec lost the persisted count:\n$desc")
      val after = DedupCatalog.screen(spark, probe, cat2).collect().toSeq
      Shared.releaseAll(spark)
      assert(after.map(_.toString) === before.map(_.toString))
    } finally DedupCatalog.drop(spark, cat)
  }

  test("vector catalog: compact preserves screen verdicts; expire forgets") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val twin = emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("h_emb"))
    val vprobe = emb.filter(col("vec_id") % 2 === 1)
      .join(twin, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("vec_id") % 7 === 3, col("h_emb"))
          .otherwise(col("embedding")).as("embedding"))
    def vevens(lo: Int, hi: Int) =
      emb.filter(col("vec_id") % 2 === 0 && col("vec_id") >= lo && col("vec_id") < hi)
    val cat = VecCatalog.land(spark, vevens(0, 300), "maint_vec")
    try {
      VecCatalog.append(spark, vevens(300, 500), cat, ingestId = 1)
      val before = VecCatalog.screen(spark, vprobe, cat).collect().toSeq
      assert(before.nonEmpty, "no planted vector verdicts")
      VecCatalog.compact(spark, cat, upToIngestId = 1)
      val after = VecCatalog.screen(spark, vprobe, cat).collect().toSeq
      assert(after.map(_.toString) === before.map(_.toString),
        "vector compaction changed screen verdicts")
      assert(ingestDirs(cat.root, "buckets") === Seq("ingest_id=0"))
      assert(VecCatalog.floor(spark, cat) === 1L)
      intercept[IllegalArgumentException] {
        VecCatalog.append(spark, vevens(300, 500), cat, ingestId = 1)
      }
      // retention: forget everything — no verdicts remain
      VecCatalog.expire(spark, cat, minIngestId = 1)
      val none = VecCatalog.screen(spark, vprobe, cat).collect().toSeq
      assert(none.isEmpty, s"expired vector catalog still matched: $none")
    } finally VecCatalog.drop(spark, cat)
  }

  test("pruneSiblings drops a stale fingerprint's catalog but never another scale's, the keeper, or a FRESH sibling") {
    import org.apache.hadoop.fs.Path
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").filter(col("vec_id") < 50)
    // simulate two testdata regens of one gate (same logical prefix,
    // different fingerprints) plus a DIFFERENT scale dir's catalog
    // that shares everything up to the dir segment
    val stale = VecCatalog.land(spark, emb, "spec_prune_sfA_11111111")
    val keep = VecCatalog.land(spark, emb, "spec_prune_sfA_22222222")
    val other = VecCatalog.land(spark, emb, "spec_prune_sfB_33333333")
    try {
      val fs = new Path(VecCatalog.defaultBase)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.exists(new Path(stale.root)) && fs.exists(new Path(keep.root)))
      // the AGE GUARD (round-19 advice): a just-built sibling is what
      // a CONCURRENT process mid-regen holds — the default prune must
      // leave it alone, files and table entries both, or two racing
      // sessions would each delete the other's in-use catalog
      VecCatalog.pruneSiblings(spark, "spec_prune_sfA_", "spec_prune_sfA_22222222")
      assert(fs.exists(new Path(stale.root)),
        "a fresh sibling was pruned — the concurrent-regen age guard is gone")
      assert(spark.catalog.tableExists(stale.bucketsT))
      // age the stale incarnation past the threshold (recursive: the
      // guard checks the NEWEST file under the root)
      def ageTree(p: Path): Unit = {
        val old = System.currentTimeMillis() - 3L * 3600 * 1000
        def walk(q: Path): Unit = {
          fs.setTimes(q, old, -1)
          if (fs.getFileStatus(q).isDirectory)
            fs.listStatus(q).foreach(st => walk(st.getPath))
        }
        walk(p)
      }
      ageTree(new Path(stale.root))
      VecCatalog.pruneSiblings(spark, "spec_prune_sfA_", "spec_prune_sfA_22222222")
      // the stale incarnation is gone — files AND table entries
      assert(!fs.exists(new Path(stale.root)), "stale root survived the prune")
      assert(!spark.catalog.tableExists(stale.bucketsT),
        "stale table entry survived the prune")
      // the keeper and the other scale's catalog are untouched and
      // still SCREENABLE (table entries intact, data readable) — the
      // keeper is protected BY NAME even when aged past the threshold
      ageTree(new Path(keep.root))
      VecCatalog.pruneSiblings(spark, "spec_prune_sfA_", "spec_prune_sfA_22222222")
      assert(fs.exists(new Path(keep.root)) && fs.exists(new Path(other.root)))
      assert(VecCatalog.screen(spark, emb, keep).columns.nonEmpty)
      assert(spark.catalog.tableExists(other.bucketsT),
        "another scale's catalog was victimized")
      // idempotent: pruning again is a no-op
      VecCatalog.pruneSiblings(spark, "spec_prune_sfA_", "spec_prune_sfA_22222222")
      assert(fs.exists(new Path(keep.root)))
    } finally {
      VecCatalog.drop(spark, keep)
      VecCatalog.drop(spark, other)
      VecCatalog.drop(spark, stale)
    }
  }
}
