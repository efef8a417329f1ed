// Dev-only round-20: the GramCatalog build/lifecycle at 100x gate
// scale (the r19 VERDICT item-1 parenthetical — the catalog behind
// the span family's at-ingest screens). Shape mirrors GramDrive14's
// sf1 lifecycle one decade up: 250k-doc landing, three 50k appends,
// 10k screens around a compact. Wall + shuffle per step.
// Run via:
//   python3 dev/make_sf1.py /tmp/graft_sf10 100
//   cp dev/GramDrive20.scala src/main/scala/graft/ && \
//     SPARK_DRIVER_MEM=48g sbt "runMain graft.GramDrive20" && \
//     rm src/main/scala/graft/GramDrive20.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.plans.GramCatalog

object GramDrive20 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("gram-drive20")
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = Tables.documents(spark, "/tmp/graft_sf10").select("doc_id", "text")
    def t[A](label: String)(f: => A): A = {
      Thread.sleep(500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime(); val r = f
      println(f"[gram20] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      r
    }
    val hist = docs.filter(col("doc_id") < 250000)
    val probe = docs.filter(col("doc_id") >= 490000).localCheckpoint(true)
    val cat = t("land 250k-doc history")(
      GramCatalog.land(spark, hist, s"drive20_${System.nanoTime()}"))
    try {
      (1 to 3).foreach { i =>
        val b = docs.filter(col("doc_id") >= 250000 + (i - 1) * 50000 &&
          col("doc_id") < 250000 + i * 50000)
        t(s"append batch $i (50k docs)")(GramCatalog.append(spark, b, cat, i.toLong))
      }
      val v1 = t("screen 10k batch @ 4 partitions")(
        GramCatalog.screen(spark, probe, cat).collect().toSet)
      t("compact(3)")(GramCatalog.compact(spark, cat, 3L))
      val v2 = t("screen 10k batch @ 1 partition")(
        GramCatalog.screen(spark, probe, cat).collect().toSet)
      println(s"[gram20] verdicts identical pre/post compact: ${v1 == v2} (${v1.size} spans)")
    } finally GramCatalog.drop(spark, cat)
    spark.stop()
  }
}
