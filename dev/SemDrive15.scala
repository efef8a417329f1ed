// Dev-only sf1 rehearsal of the semantic catalog lifecycle: does the
// cid-bucketed SemDeDup state store hold its shape at 10x bench scale,
// and is compaction verdict-invisible at volume?
//   1. Land a 10k-vector catalog (even ids, k=64 cells), then 8
//      appends of 1k odd vectors each (steady-state cadence; sf1
//      replicas are exact copies so verdicts fire corpus-wide) ->
//      screen a 1k probe batch at 9 ingest partitions, timed.
//   2. compact(8) -> same screen, verdicts must be IDENTICAL,
//      partition count collapses to 1.
//   3. Pinned geometry under append: a pre-append screen bounded to
//      the landing must replay bit-identically after all appends.
// Run via:
//   python3 dev/make_sf1.py
//   cp dev/SemDrive15.scala src/main/scala/graft/ && \
//     sbt "runMain graft.SemDrive15" && rm src/main/scala/graft/SemDrive15.scala
package graft

import org.apache.spark.sql.functions._
import graft.plans.SemCatalog

object SemDrive15 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("sem-drive15")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/tmp/graft_sf1").select("vec_id", "embedding")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[semdrive] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val hist = emb.filter(col("vec_id") % 2 === 0)
    val probe = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") >= 18000)
      .localCheckpoint(true)
    val cat = t("land 10k-vector history (k=64)") {
      SemCatalog.land(spark, hist, s"drive15_${System.nanoTime()}", nCentroids = 64)
    }
    try {
      (1 to 8).foreach { i =>
        val b = emb.filter(col("vec_id") % 2 === 1 &&
          col("vec_id") >= (i - 1) * 2000 && col("vec_id") < i * 2000)
        t(s"append batch $i (1k vectors)")(SemCatalog.append(spark, b, cat, i.toLong))
      }
      def nParts = new java.io.File(s"${cat.root}/cells")
        .listFiles().count(_.getName.startsWith("ingest_id="))
      val landingOnly = t("screen @ landing only (bound 0)") {
        SemCatalog.screen(spark, probe, cat, maxIngestId = Some(0L))
          .collect().toSeq
      }
      println(s"[semdrive]   $nParts ingest partitions")
      val frag = t(s"screen @ $nParts partitions") {
        SemCatalog.screen(spark, probe, cat).collect().toSeq
      }
      println(s"[semdrive]   ${frag.size} verdicts (fragmented)")
      // pinned geometry: the landing-bound screen replays identically
      // even with 8 appended partitions present (appends can never
      // move a seed)
      val landingReplay = t("landing-bound screen after appends") {
        SemCatalog.screen(spark, probe, cat, maxIngestId = Some(0L))
          .collect().toSeq
      }
      println(s"[semdrive]   pinned-geometry replay == pre-append: " +
        s"${landingReplay == landingOnly}")
      t("compact(8)")(SemCatalog.compact(spark, cat, 8L))
      println(s"[semdrive]   $nParts partitions after compact")
      val comp = t("screen @ compacted") {
        SemCatalog.screen(spark, probe, cat).collect().toSeq
      }
      println(s"[semdrive]   verdict identity post-compact: ${frag == comp}")
    } finally SemCatalog.drop(spark, cat)
  }
}
