// Dev-only round-20 control: isolate the span-cut stage's scaling from
// the corpus's duplicate mass. Runs Dedup.cutDupSpansFrom alone over
//  - /tmp/graft_sf1   (10x,  every replica a near-dup of its source)
//  - /tmp/graft_sf10  (100x, same construction -> ~100 true dup
//    partners per source text)
//  - /tmp/graft_sf10d (100x, replicas token-suffixed -> ZERO
//    cross-replica duplicate spans)
// If sf10d's shuffle is ~linear vs sf1 while sf10's is supra-linear,
// the supra-linearity is DATA-BORNE (quadratic duplicate mass), not an
// engine shuffle defect. Run like dev/PipeDrive20.scala.
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object CutDrive20 {
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
    for ((dir, label) <- Seq("/tmp/graft_sf1" -> "sf1_neardup",
                             "/tmp/graft_sf10" -> "sf10_neardup",
                             "/tmp/graft_sf10d" -> "sf10_disjoint")) {
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.cutDupSpansFrom(
        Tables.documents(spark, dir).select("doc_id", "text")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cut20] $label%-14s ${sec}%8.2f s  rows=$n%-8d shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
