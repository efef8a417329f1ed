// Dev-only measurement of the BQ candidate cut's two plan shapes at
// production row counts: 8 queries x 2M corpus = 16M Hamming rows
// through (a) the row_number window over 8 query partitions and
// (b) the bounded map-side top-k aggregate (BoundedMinTopK) that
// replaced it. Rows are synthesized directly at the cut's input shape
// (query_id, vec_id, hdist) — the claim under test is the CUT stage's
// shuffle and wall, not the Hamming arithmetic. Selection equality is
// asserted row-for-row.
// NOTE: graft.functions.BoundedMinTopK was removed from src when the
// hand-built cut measured worse and was reverted (commit 0a9afa4) — to
// reproduce this measurement, check out the pre-revert tree first:
//   git checkout 7431d50
//   cp dev/CutDrive17.scala src/main/scala/graft/ && \
//     sbt "runMain graft.CutDrive17" && rm src/main/scala/graft/CutDrive17.scala
//   git checkout main
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object CutDrive17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nQ = 8; val nCorpus = 2000000L; val rerank = 192
    // deterministic pseudo-Hamming distances in [0, 64] — the real
    // distribution is Binomial(64, 1/2)-ish; a flat mod-65 draw is
    // HARDER on the cut (more ties at every value)
    val ham = spark.range(0, nCorpus).select(col("id").as("vec_id"))
      .crossJoin(spark.range(0, nQ).select(col("id").as("query_id")))
      .select(col("query_id"), col("vec_id"),
        pmod(xxhash64(concat(lit("h|"), col("query_id"), lit("|"), col("vec_id"))),
          lit(65)).cast("int").as("hdist"))
      .repartition(32)
      .persist()
    println(s"input rows = ${ham.count()}")

    val shuffleAcc = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        shuffleAcc.addAndGet(st.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def shuffleBytes[A](f: => A): (A, Double, Long) = {
      shuffleAcc.set(0L)
      val t0 = System.nanoTime(); val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain
      (a, dt, shuffleAcc.get())
    }

    val w = Window.partitionBy("query_id").orderBy(col("hdist"), col("vec_id"))
    val (viaWindow, tW, bW) = shuffleBytes {
      ham.withColumn("rr", row_number().over(w)).filter(col("rr") <= rerank)
        .select("query_id", "vec_id", "hdist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(identity)
    }
    println(f"window cut:    $tW%.2f s, shuffle ${bW / 1048576.0}%.1f MiB, rows=${viaWindow.length}")

    val cut = udaf(new graft.functions.BoundedMinTopK(rerank),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaLong))
    val (viaAgg, tA, bA) = shuffleBytes {
      ham.groupBy("query_id").agg(cut(col("hdist"), col("vec_id")).as("tk"))
        .select(col("query_id"), explode(col("tk")).as("c"))
        .select(col("query_id"), col("c._2").as("vec_id"), col("c._1").as("hdist"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(identity)
    }
    println(f"bounded agg:   $tA%.2f s, shuffle ${bA / 1048576.0}%.1f MiB, rows=${viaAgg.length}")
    println(s"selection identical = ${viaWindow.sameElements(viaAgg)}")
    spark.stop()
  }
}
