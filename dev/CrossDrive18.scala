// Dev-only round-18 sf1 rehearsal (PLANS.md receipt): the at-ingest
// cross-modal verdict (mm_cross_incr) at 10x the gate corpus — four
// modality catalogs landed from 25k even-id docs, a 25k odd-id batch
// screened against all four in one composed pass. First rep pays the
// one-time landings; the steady-state rep is the serving cost.
// Run via:
//   python3 dev/make_sf1.py   # if /tmp/graft_sf1 is stale
//   cp dev/CrossDrive18.scala src/main/scala/graft/ && \
//     sbt "runMain graft.CrossDrive18" && rm src/main/scala/graft/CrossDrive18.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object CrossDrive18 {
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

    def timed[A](label: String)(f: => A): A = {
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"[cross18] $label%-44s ${sec}%8.2f s  shuffle=${shuffleBytes.get / 1048576.0}%9.2f MiB")
      r
    }

    val q = graft.queries.TrainingPack.queries("mm_cross_incr")
    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
                           "sf1  " -> "/tmp/graft_sf1")) {
      for (rep <- 1 to 2) {
        val n = timed(s"$tag mm_cross_incr rep$rep") { q(spark, dir).count() }
        if (rep == 2) println(s"[cross18] $tag batch verdict rows = $n")
        graft.Shared.releaseAll(spark)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
