// Dev-only round-20: verify the span-cut decade inflation is the
// gramMin join flipping broadcast -> shuffle when the build side's
// size estimate crosses the AQE broadcast threshold. Prints the join
// strategy at sf1/sf10 and measures sf10's del stage with broadcast
// forced. Run like dev/PipeDrive20.scala.
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object CutJoin20 {
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
    val k = graft.operators.Dedup.ShingleN
    def delOf(dir: String, bcast: Boolean): DataFrame = {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val grams = graft.operators.Dedup.positionalGrams(docs, k)
      val gm0 = grams.select("gram", "doc_id").distinct()
        .groupBy("gram")
        .agg(count(lit(1)).as("df"), min("doc_id").as("gmin"))
        .filter(col("df") >= 2).select("gram", "gmin")
      val gm = if (bcast) broadcast(gm0) else gm0
      grams.join(gm, Seq("gram"))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"),
          (col("gmin") === col("doc_id")).as("kf"))
        .groupBy("doc_id", "tpos")
        .agg(max(when(col("kf"), 0).otherwise(1)).as("hc"),
          max(when(col("kf"), 1).otherwise(0)).as("hk"))
        .filter(col("hc") === 1 && col("hk") === 0)
    }
    for ((dir, label) <- Seq("/tmp/graft_sf1" -> "sf1",
                             "/tmp/graft_sf10" -> "sf10")) {
      val df = delOf(dir, bcast = false)
      df.count() // let AQE finalize the real strategy
      val plan = df.queryExecution.executedPlan.toString
      val strat =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else "other"
      println(s"[join20] $label del join strategy (AQE final): $strat")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    for (bcast <- Seq(false, true)) {
      Thread.sleep(1000)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = delOf("/tmp/graft_sf10", bcast).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[join20] sf10 del bcast=$bcast%-5s ${sec}%8.2f s  rows=$n%-9d shuffle=${shuffleBytes.get / 1048576.0}%9.1f MiB")
      graft.Shared.releaseAll(spark); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
