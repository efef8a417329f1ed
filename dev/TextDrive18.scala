// Dev-only round-18 sf1 rehearsal (PLANS.md receipt): the two new
// text-family operators at 10x the bench scale — 50k docs
// (/tmp/graft_sf1, near-dup-planted replicas):
//   1. tx_classifier_score's shape (Classifier.scoreFrom): feature
//      explode + broadcast weight join + doc rollup — expect linear
//      in corpus tokens, shuffle = doc-rollup only.
//   2. tx_contamination_spans' shape (Dedup.contaminationSpansFrom):
//      positional grams + benchmark semi-join + island merge — expect
//      linear, with the hashKeys variant cutting gram-keyed shuffle
//      bytes like the dupSpans family.
// Run via:
//   python3 dev/make_sf1.py   # if /tmp/graft_sf1 is stale
//   cp dev/TextDrive18.scala src/main/scala/graft/ && \
//     sbt "runMain graft.TextDrive18" && rm src/main/scala/graft/TextDrive18.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup}

object TextDrive18 {
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
      println(f"[text18] $label%-52s ${sec}%8.2f s  shuffle=${shuffleBytes.get / 1048576.0}%9.2f MiB")
      r
    }

    for ((tag, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
                           "sf1  " -> "/tmp/graft_sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = timed(s"$tag classifier scoreFrom") {
        Classifier.scoreFrom(docs,
          col("doc_id") % 10 === 0, col("doc_id") % 10 === 5).count()
      }
      println(s"[text18] $tag scored docs = $n")
      for (hk <- Seq(false, true)) {
        val m = timed(s"$tag contamination spans hashKeys=$hk") {
          Dedup.contaminationSpansFrom(
            docs.filter(col("doc_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0), k = 5, hashKeys = hk)
            .agg(count(lit(1)), sum(col("span_end") - col("span_start") + 1))
            .collect()(0)
        }
        println(s"[text18] $tag hashKeys=$hk spans=${m.getLong(0)} tokens=${m.getLong(1)}")
      }
    }
    spark.stop()
  }
}
