// Dev-only round-20 decomposition of the span-cut stage's shuffle at
// sf1 vs sf10 (both near-dup corpora): which internal stage inflates
// 2x over linear? Phases measured cumulatively from fresh plans:
//   g  = positional gram build + distinct + groupBy(gram) [gramMin]
//   d  = + dupPos join + coverage explode + (doc,tpos) fold  [del]
//   f  = full cutDupSpansFrom
// Run like dev/PipeDrive20.scala.
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CutDecomp20 {
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
      Thread.sleep(1000)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decomp20] $label%-18s ${sec}%8.2f s  rows=$n%-9d shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    val k = graft.operators.Dedup.ShingleN
    for ((dir, label) <- Seq("/tmp/graft_sf1" -> "sf1",
                             "/tmp/graft_sf10" -> "sf10")) {
      def docs = Tables.documents(spark, dir).select("doc_id", "text")
      def grams = graft.operators.Dedup.positionalGrams(docs, k)
      def gramMin = grams.select("gram", "doc_id").distinct()
        .groupBy("gram")
        .agg(count(lit(1)).as("df"), min("doc_id").as("gmin"))
        .filter(col("df") >= 2).select("gram", "gmin")
      timed(s"${label}_g_grammin") { gramMin.count() }
      def del = grams.join(gramMin, Seq("gram"))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"),
          (col("gmin") === col("doc_id")).as("kf"))
        .groupBy("doc_id", "tpos")
        .agg(max(when(col("kf"), 0).otherwise(1)).as("hc"),
          max(when(col("kf"), 1).otherwise(0)).as("hk"))
        .filter(col("hc") === 1 && col("hk") === 0)
      timed(s"${label}_d_del") { del.count() }
      timed(s"${label}_f_full") {
        graft.operators.Dedup.cutDupSpansFrom(docs).count()
      }
    }
    spark.stop()
  }
}
