// Dev-only sf1 rehearsal of the round-11 maintenance lifecycle: does
// compaction ACTUALLY buy back what ingest fragmentation costs, and
// what do the destructive ops themselves cost at 10x bench scale?
//   1. Fragment a DedupCatalog the way production would: land 25k-doc
//      history, then 30 small appends (one ingest partition each, the
//      steady-state cadence shape) -> measure screen latency and
//      file counts at 31 partitions.
//   2. compact(30) -> same measurements after the fold.
//   3. expire(archive) of the whole folded landing -> cost of the
//      cleanUp/hcOwt analog at this scale + archive readability.
//   4. Retention.sweep over a 1M-event day-partitioned landing
//      (30 days -> keep 7): the partition-level sweep is O(partitions)
//      dir deletes, never a corpus walk.
// Run via:
//   python3 dev/make_sf1.py
//   cp dev/MaintDrive.scala src/main/scala/graft/ && \
//     sbt "runMain graft.MaintDrive" && rm src/main/scala/graft/MaintDrive.scala
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{DedupCatalog, Retention}

object MaintDrive {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def median3(f: => Long): (Long, Double) = {
      val runs = (1 to 3).map { _ =>
        val r = time(f); Shared.releaseAll(spark); spark.catalog.clearCache(); r
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }
    def files(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet") || f.getName.startsWith("part-")) 1
        else 0
      walk(new java.io.File(root))
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val twin = docs.select((col("doc_id") + 1).as("doc_id"),
      col("text").as("h_text"))
    val probe = docs.filter(col("doc_id") % 2 === 1)
      .join(twin, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("h_text"), lit(" zz")))
          .otherwise(col("text")).as("text"))
      .filter(col("doc_id") % 25 === 1) // ~2k probe docs

    // ---- 1. fragment: land + 30 small appends -----------------------
    val base = s"${sys.props("java.io.tmpdir")}/graft_maintdrive"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    val (cat, tLand) = time(DedupCatalog.land(spark, hist, "maint_sf1", base = base))
    println(f"[maint] land 25k-doc history: $tLand%.1f s")
    val (_, tApp) = time {
      (1 to 30).foreach { i =>
        DedupCatalog.append(spark,
          docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 60 === 2 * i - 1),
          cat, ingestId = i)
      }
    }
    println(f"[maint] 30 appends (~830 docs each): $tApp%.1f s total, ${tApp / 30}%.2f s/batch")
    val fFrag = files(cat.root)
    val (nFrag, tFrag) = median3(DedupCatalog.screen(spark, probe, cat).count())
    println(f"[maint] screen at 31 partitions / $fFrag files: $tFrag%.2f s ($nFrag verdicts)")

    // ---- 2. compact -------------------------------------------------
    val (_, tCompact) = time(DedupCatalog.compact(spark, cat, upToIngestId = 30))
    val fComp = files(cat.root)
    val (nComp, tComp) = median3(DedupCatalog.screen(spark, probe, cat).count())
    println(f"[maint] compact(30): $tCompact%.1f s -> $fComp files")
    println(f"[maint] screen at 1 partition: $tComp%.2f s ($nComp verdicts)")
    require(nComp == nFrag, s"compaction changed verdicts: $nFrag -> $nComp")

    // ---- 3. expire with archive ------------------------------------
    val arch = s"$base/archive"
    val szBefore = spark.table(cat.sizesT).count()
    val (_, tExp) = time(DedupCatalog.expire(spark, cat, minIngestId = 31,
      archiveDir = Some(arch)))
    val szArch = spark.read.parquet(s"$arch/sizes/ingest_id=0").count()
    println(f"[maint] expire-with-archive of the whole landing: $tExp%.1f s; " +
      f"archived sizes rows $szArch%d (live was $szBefore%d)")
    require(szArch == szBefore, s"archive lost rows: $szBefore -> $szArch")

    // ---- 4. retention sweep over 1M day-partitioned events ----------
    val evRoot = s"$base/events_by_day"
    val ev = Tables.events(spark, dir)
    val (_, tEvLand) = time {
      ev.withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(evRoot)
    }
    val days = Retention.partitionValues(spark, evRoot, "day").sorted
    val cut = days(days.size - 7)
    val (dropped, tSweep) = time(Retention.sweep(spark, evRoot, "day", cut))
    val kept = spark.read.parquet(evRoot).count()
    println(f"[maint] events landing (1M rows, ${days.size}%d days): $tEvLand%.1f s; " +
      f"sweep dropped ${dropped.size}%d partitions in $tSweep%.2f s; $kept%d rows kept")

    DedupCatalog.drop(spark, cat)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
