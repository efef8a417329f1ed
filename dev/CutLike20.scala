// Dev-only round-20: the LIKE-FOR-LIKE decade receipt for the span
// cut. sf1 naturally broadcasts the gramMin side while sf10 flips to
// SortMergeJoin, so the raw decade ratio mixes plan shapes; at true
// 100 TB BOTH decades run SMJ. This forces SMJ at sf1 too
// (autoBroadcastJoinThreshold=-1, incl. the AQE variant) and compares
// like with like on the SHIPPING build (post doc-locality fix).
// Run like dev/PipeDrive20.scala.
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object CutLike20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    for ((dir, label) <- Seq("/tmp/graft_sf1" -> "sf1_smj",
                             "/tmp/graft_sf10" -> "sf10_smj")) {
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.cutDupSpansFrom(
        Tables.documents(spark, dir).select("doc_id", "text")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[like20] $label%-10s ${sec}%8.2f s  rows=$n%-8d shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
