// Dev-only round-19 scale rehearsal (PLANS.md receipt): the flagship
// tx_pipeline_full DAG and tx_semantic_decontam at sf0.1 and the 10x
// dev sf1 corpus — wall + total shuffle bytes, the done-criterion of
// the r18 VERDICT's item 1.
// Run via:
//   python3 dev/make_sf1.py && cp dev/PipeDrive19.scala src/main/scala/graft/ && \
//     SPARK_DRIVER_MEM=48g sbt "runMain graft.PipeDrive19" && \
//     rm src/main/scala/graft/PipeDrive19.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object PipeDrive19 {
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
      println(f"[drive19p] $label%-28s ${sec}%8.2f s  rows=$rows%-8d shuffle=${shuffleBytes.get / 1048576.0}%8.1f MiB")
    }

    for ((dir, label) <- Seq("/root/testdata/sf0.1" -> "sf0.1",
                             "/tmp/graft_sf1" -> "sf1")) {
      timed(s"semantic_decontam_$label") {
        val n = SparkEntry.queries("tx_semantic_decontam")(spark, dir).count()
        graft.Shared.releaseAll(spark); spark.catalog.clearCache(); n
      }
      timed(s"pipeline_full_$label") {
        val n = SparkEntry.queries("tx_pipeline_full")(spark, dir).count()
        graft.Shared.releaseAll(spark); spark.catalog.clearCache(); n
      }
    }
    spark.stop()
  }
}
