// Dev-only sf1 rehearsal of the gram catalog lifecycle (round 14):
// does the substring-dedup state store hold its shape at 10x bench
// scale, and is compaction verdict-invisible at volume?
//   1. Land a 25k-doc gram-stats catalog, then 10 appends of 2.4k
//      docs each (steady-state cadence) -> screen a 1k batch at 11
//      ingest partitions, timed.
//   2. compact(10) -> same screen, verdicts must be IDENTICAL,
//      partition count collapses to 1.
//   3. expire(archive) of everything below the last append -> the
//      aged df contributions are forgotten; screen reflects it.
// Run via:
//   python3 dev/make_sf1.py
//   cp dev/GramDrive14.scala src/main/scala/graft/ && \
//     sbt "runMain graft.GramDrive14" && rm src/main/scala/graft/GramDrive14.scala
package graft

import org.apache.spark.sql.functions._
import graft.plans.GramCatalog

object GramDrive14 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("gram-drive14")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/tmp/graft_sf1").select("doc_id", "text")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gramdrive] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val hist = docs.filter(col("doc_id") < 25000)
    val probe = docs.filter(col("doc_id") >= 49000).localCheckpoint(true)
    val cat = GramCatalog.land(spark, hist, s"drive14_${System.nanoTime()}")
    try {
      t("land 25k-doc history")(()) // landing happened in land() above; time appends below
      (1 to 10).foreach { i =>
        val b = docs.filter(col("doc_id") >= 25000 + (i - 1) * 2400 &&
          col("doc_id") < 25000 + i * 2400)
        t(s"append batch $i (2.4k docs)")(GramCatalog.append(spark, b, cat, i.toLong))
      }
      def nParts = new java.io.File(s"${cat.root}/stats")
        .listFiles().count(_.getName.startsWith("ingest_id="))
      println(s"[gramdrive] partitions before compact: $nParts")
      val v1 = t("screen 1k batch @ 11 partitions")(
        GramCatalog.screen(spark, probe, cat).collect().toSet)
      t("compact(10)")(GramCatalog.compact(spark, cat, 10L))
      println(s"[gramdrive] partitions after compact: $nParts")
      val v2 = t("screen 1k batch @ 1 partition")(
        GramCatalog.screen(spark, probe, cat).collect().toSet)
      println(s"[gramdrive] verdicts identical: ${v1 == v2} (${v1.size} spans)")
      val arch = java.nio.file.Files.createTempDirectory("gram_arch").toString
      t("expire(<=10, archived)")(
        GramCatalog.expire(spark, cat, 11L, Some(arch)))
      val v3 = t("screen after expire")(
        GramCatalog.screen(spark, probe, cat).collect().toSet)
      println(s"[gramdrive] post-expire spans: ${v3.size} (history forgotten)")
      println(s"[gramdrive] archive readable rows: " +
        spark.read.parquet(s"$arch/stats/ingest_id=0").count())
    } finally GramCatalog.drop(spark, cat)
    spark.stop()
  }
}
