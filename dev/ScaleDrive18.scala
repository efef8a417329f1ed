// Dev-only round-18 scale rehearsal (PLANS.md receipt): the IVF+BQ
// serving composition at 10^7 vectors — the round-17 CutDrive measured
// the CUT stage at 2M rows; this drives the WHOLE ivfBqTopKFrom path
// (centroid sample -> cell assignment -> probe -> Hamming over packed
// words -> WindowGroupLimit cut -> exact decimal rerank of <= rerank
// rows/query) at 2M and 10M corpus sizes, reporting wall, total
// shuffle bytes, and the per-stage row bounds that make the plan
// serve: candidates ~ nProbe/nCentroids of the corpus, reranked rows
// = rerank * nQueries regardless of corpus size.
// Vectors are synthesized deterministically in-plan (hash-derived
// floats, unit-free — Hamming/dot only need value spread), written
// once as multi-row-group parquet so the scan parallelizes.
// Run via:
//   cp dev/ScaleDrive18.scala src/main/scala/graft/ && \
//     sbt "runMain graft.ScaleDrive18" && rm src/main/scala/graft/ScaleDrive18.scala
package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object ScaleDrive18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory is a no-op for an in-process local
      // master (the JVM heap is fixed at launch) — heap comes from
      // build.sbt's fork options / SPARK_DRIVER_MEM
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
      println(f"[scale18] $label%-46s ${sec}%8.2f s  shuffle=${shuffleBytes.get / 1048576.0}%9.2f MiB")
      r
    }

    // deterministic 64-dim float vectors: per (id, dim) a signed hash
    // value in [-1, 1) — same spread as the testdata embeddings
    def synth(n: Long, path: String): Unit = {
      if (new java.io.File(s"$path/_SUCCESS").exists) return
      spark.range(0, n, 1, 64)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => (pmod(xxhash64(col("id") * 64 + i), lit(2000000)).cast("double")
              / 1000000.0 - 1.0).cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(path)
    }

    for (n <- Seq(2000000L, 10000000L)) {
      val path = s"/tmp/graft_scale18_${n / 1000000}m"
      timed(s"synth+write ${n / 1000000}M x 64f")(synth(n, path))
      val emb = spark.read.parquet(path)
      // steady-state wall: run once cold, once warm, report both
      for (rep <- 1 to 2) {
        val out = timed(s"ivfBqTopKFrom ${n / 1000000}M rep$rep " +
          "(C=64, probe=6, rerank=192)") {
          Similarity.ivfBqTopKFrom(emb, nQueries = 8, k = 10,
            nCentroids = 64, nProbe = 6, rerank = 192).collect()
        }
        require(out.length == 80, s"expected 8x10 rows, got ${out.length}")
      }
      // the stage bound that makes the plan serve: candidate rows per
      // query ~ (nProbe / nCentroids) * n, never n
      val cand = timed(s"candidate count ${n / 1000000}M") {
        Similarity.ivfCandidates(emb, nQueries = 8, nCentroids = 64,
          nProbe = 6).count()
      }
      println(f"[scale18] ${n / 1000000}M: candidate rows = $cand " +
        f"(${cand.toDouble / (8 * n) * 100}%.1f%% of 8 full scans)")
    }
    spark.stop()
  }
}
