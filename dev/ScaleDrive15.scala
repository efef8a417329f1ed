// Dev-only round-15 scale rehearsal: sf0.1 -> sf1 receipts for the
// four new operators (SemDeDup, LM score, LM head-cut, temperature
// mix), measured at operator volume.
//   1. semanticDedupFrom over the full embeddings table - at sf1 the
//      replicas are EXACT copies (9 twins per source vector), so the
//      drop rule fires corpus-wide; nCentroids scales 16 -> 64 with
//      the corpus (the SemDeDup regime: cells stay bounded).
//   2. lmScore over all documents (trigram stream ~10x).
//   3. txLmThreshold composition (score + calibration + keep).
//   4. temperatureMix over all documents.
// Run via:
//   python3 dev/make_sf1.py   # if /tmp/graft_sf1 is stale
//   cp dev/ScaleDrive15.scala src/main/scala/graft/ && \
//     sbt "runMain graft.ScaleDrive15" && rm src/main/scala/graft/ScaleDrive15.scala
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{LangModel, Mixer, Similarity}

object ScaleDrive15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale15] $label%-58s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup pass at sf0.001 so sf0.1 -> sf1 measures data scaling
    for (dir <- Seq("/root/testdata/sf0.001",
        "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      println(s"[scale15] ===== $dir =====")
      val k = if (dir.endsWith("sf1")) 64 else 16

      val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val n1 = timed(s"semanticDedup (nCentroids=$k)") {
        Similarity.semanticDedupFrom(emb, nCentroids = k).count()
      }
      println(s"[scale15]   dropped $n1 of ${emb.count()}")

      val n2 = timed("lmScore") { LangModel.lmScore(spark, dir).count() }
      println(s"[scale15]   scored $n2 docs")

      val n3 = timed("txLmThreshold") {
        val df = queries.TrainingPack.txLmThreshold(spark, dir)
        val c = df.count()
        Shared.releaseAll(spark)
        c
      }
      println(s"[scale15]   kept $n3 of $n2")

      val n4 = timed("temperatureMix") {
        Mixer.temperatureMix(spark, dir).count()
      }
      println(s"[scale15]   mixed in $n4")

      val n5 = timed("txTokenBudget") {
        val c = queries.TrainingPack.txTokenBudget(spark, dir).count()
        Shared.releaseAll(spark)
        c
      }
      println(s"[scale15]   budget-kept $n5")

      val n6 = timed(s"semanticScreen (even hist / odd batch, k=$k)") {
        val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
        Similarity.semanticScreenFrom(
          emb.filter(col("vec_id") % 2 === 1),
          emb.filter(col("vec_id") % 2 === 0), nCentroids = k).count()
      }
      println(s"[scale15]   screen dropped $n6")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
