// Dev-only round-20 scale rehearsal (PLANS.md receipt): the flagship
// tx_pipeline_full DAG PER STAGE at sf0.1, the 10x sf1 corpus, and
// the 100x sf10 corpus — wall + shuffle-write bytes per stage, the
// done-criterion of the r19 VERDICT's item 1 ("one more decade").
// Run via:
//   python3 dev/make_sf1.py /tmp/graft_sf1 10 && \
//   python3 dev/make_sf1.py /tmp/graft_sf10 100 && \
//   cp dev/PipeDrive20.scala src/main/scala/graft/ && \
//     SPARK_DRIVER_MEM=48g sbt "runMain graft.PipeDrive20" && \
//     rm src/main/scala/graft/PipeDrive20.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

object PipeDrive20 {
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

    for ((dir, label) <- Seq("/root/testdata/sf0.1" -> "sf0.1",
                             "/tmp/graft_sf1" -> "sf1",
                             "/tmp/graft_sf10" -> "sf10")) {
      Thread.sleep(1500)
      var t0 = System.nanoTime()
      var sh0 = 0L
      shuffleBytes.set(0L)
      val hook: (String, DataFrame) => Unit = { (stage, df) =>
        // boundaries are EAGER: by the time the hook fires the stage's
        // work is done, so deltas since the previous hook are honest
        val sec = (System.nanoTime() - t0) / 1e9
        val sh = shuffleBytes.get
        val rows = df.count() // checkpointed — a metadata-cheap count
        println(f"[drive20] $label%-6s $stage%-22s ${sec}%8.2f s  rows=$rows%-8d shuffle=${(sh - sh0) / 1048576.0}%9.1f MiB")
        t0 = System.nanoTime()
        sh0 = sh
      }
      val n = graft.queries.TrainingPack.pipelineFull(spark, dir,
        checkpointDir = None, stageHook = hook).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[drive20] $label%-6s ${"s7s8_shuffle_pack"}%-22s ${sec}%8.2f s  rows=$n%-8d shuffle=${(shuffleBytes.get - sh0) / 1048576.0}%9.1f MiB")
      println(f"[drive20] $label%-6s ${"TOTAL"}%-22s shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
