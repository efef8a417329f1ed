// Dev-only round-17 scale rehearsals (PLANS.md receipts):
//   1. xxhash64 gram-key swap for the duplicate-span family: string
//      vs hashed keys at sf0.1 and sf1 — wall time, SHUFFLE BYTES
//      (SparkListener sum of stage shuffle-write), and a verdict
//      digest (row count + span-token sum) that must be identical.
//   2. The many-cluster SemDeDup regime: nCentroids ∈ {sampled-k,
//      1024, 2048} at sf1 (20k vectors -> cells of ~10-20, the
//      paper's 50k-cluster shape scaled to the corpus) — the last
//      argued-not-measured scale claim (r15 item 7).
// Run via:
//   python3 dev/make_sf1.py   # if /tmp/graft_sf1 is stale
//   cp dev/ScaleDrive17.scala src/main/scala/graft/ && \
//     sbt "runMain graft.ScaleDrive17" && rm src/main/scala/graft/ScaleDrive17.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

object ScaleDrive17 {
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
      // drain listener events from the previous block before resetting
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let stage-completed events land
      println(f"[scale17] $label%-52s ${sec}%8.2f s  shuffle=${shuffleBytes.get / 1048576.0}%9.2f MiB")
      r
    }

    for (dir <- Seq("/root/testdata/sf0.001",
        "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      println(s"[scale17] ===== $dir =====")
      val docs = Tables.documents(spark, dir)

      for (hash <- Seq(false, true)) {
        val tag = if (hash) "xxhash64" else "string"
        val d = timed(s"dupSpans k=4 keys=$tag") {
          Dedup.dupSpansFrom(docs, k = 4, hashKeys = hash)
            .agg(count(lit(1)), sum(col("span_end") - col("span_start") + 1))
            .collect()(0)
        }
        println(s"[scale17]   spans=${d.getLong(0)} tokens=${d.get(1)}")
        val c = timed(s"cutDupSpans k=4 keys=$tag") {
          Dedup.cutDupSpansFrom(docs, hashKeys = hash)
            .agg(count(lit(1)), sum(col("n_before") - col("n_after")))
            .collect()(0)
        }
        println(s"[scale17]   docs=${c.getLong(0)} cut_tokens=${c.get(1)}")
      }

      if (dir.endsWith("sf1")) {
        val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
        val n = emb.count()
        for (k <- Seq(Similarity.centroidsFor(n), 1024, 2048)) {
          val dropped = timed(s"semanticDedup nCentroids=$k") {
            Similarity.semanticDedupFrom(emb, nCentroids = k).count()
          }
          println(s"[scale17]   dropped $dropped of $n")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
