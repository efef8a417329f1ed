// Dev-only round-19 scale rehearsal (PLANS.md receipt): the round-18
// streaming-screen family (mm_stream_afp / mm_stream_vfp's SigCatalog
// screen core) and the classifier at-ingest twin at 10x landed
// history — the one r18 family without a 10x rehearsal (VERDICT r18
// item 7). Claims under test:
//  - per-batch screen cost scales with the BATCH, not the landed
//    history (catalog co-partitioned on the band key): a fixed 1k-doc
//    batch screens FLAT as history grows 12x;
//  - classifier training is ONE corpus aggregation (linear in the
//    retrain slice, paid per retrain cadence, not per batch) and
//    scoring under pinned weights is batch-bound (flat).
// Run via:
//   python3 dev/make_sf1.py && cp dev/StreamDrive19.scala src/main/scala/graft/ && \
//     SPARK_DRIVER_MEM=48g sbt "runMain graft.StreamDrive19" && \
//     rm src/main/scala/graft/StreamDrive19.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Multimodal}
import graft.plans.SigCatalog

object StreamDrive19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timed(label: String)(f: => Long): Unit = {
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[drive19] $label%-28s ${sec}%8.2f s  rows=$rows%-8d shuffle=${shuffleBytes.get / 1048576.0}%8.1f MiB")
    }

    for ((dir, label) <- Seq("/root/testdata/sf0.1" -> "sf0.1",
                             "/tmp/graft_sf1" -> "sf1")) {
      // ---- streaming-screen core at growing history, fixed batch ----
      // batch = docs < 1000 (identical rows in both dirs), history =
      // the rest (4k at sf0.1, 49k at sf1 — 12x)
      def sigSplit(sigs: org.apache.spark.sql.DataFrame) = (
        sigs.filter(col("doc_id") >= 1000),
        sigs.filter(col("doc_id") < 1000).localCheckpoint(true))
      val afp = Multimodal.audioFingerprints(spark, dir)
        .filter(col("valid")).select(col("doc_id"), col("afp").as("sh"))
      val (ah, ab) = sigSplit(afp)
      val acat = SigCatalog.land(spark, ah, s"drive19_afp_$label")
      timed(s"afp_screen_cold_$label") {
        SigCatalog.screen(spark, ab, acat).count() }
      timed(s"afp_screen_steady_$label") {
        SigCatalog.screen(spark, ab, acat).count() }
      val vfp = Multimodal.videoFingerprints(spark, dir)
        .filter(col("valid")).select(col("doc_id"), col("vfp").as("sh"))
      val (vh, vb) = sigSplit(vfp)
      val vcat = SigCatalog.land(spark, vh, s"drive19_vfp_$label")
      timed(s"vfp_screen_cold_$label") {
        SigCatalog.screen(spark, vb, vcat).count() }
      timed(s"vfp_screen_steady_$label") {
        SigCatalog.screen(spark, vb, vcat).count() }
      SigCatalog.drop(spark, acat)
      SigCatalog.drop(spark, vcat)

      // ---- classifier at-ingest twin: retrain pass vs batch score ----
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val hist = docs.filter(col("doc_id") >= 1000)
      val batch = docs.filter(col("doc_id") < 1000).localCheckpoint(true)
      var w: org.apache.spark.sql.DataFrame = null
      timed(s"cls_train_$label") {
        w = Classifier.pinnedWeights(hist,
          col("doc_id") % 10 === 0, col("doc_id") % 10 === 5)
          .localCheckpoint(true)
        graft.Shared.releaseAll(spark)
        w.count()
      }
      timed(s"cls_score_batch_$label") {
        val n = Classifier.scoreWith(batch, w).count()
        graft.Shared.releaseAll(spark)
        n
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
