// Dev-only sf1-scale rehearsal of the SigCatalog lifecycle: does the
// banded-signature state store hold the same shape the minhash/gram/
// semantic catalogs proved — flat appends, batch-bound screens,
// compaction buying back fragmentation with verdict invisibility —
// at 500k landed signatures (100x the sf0.1 gate)?
//   1. Land a 500k-signature history (xxhash64 words — the signature
//      content is irrelevant to the lifecycle, only its cardinality
//      and band distribution matter; xxhash64 gives md5-grade bit
//      dispersion at a fraction of the generation cost).
//   2. 8 appends of 25k signatures each (steady-state cadence).
//   3. Screen a 25k batch with planted twins aimed at the landing AND
//      at appended partitions (d=1 retouches), at 9 ingest partitions.
//   4. compact(8) -> screen again: wall bought back, verdicts
//      bit-identical, partitions folded.
// Run via:
//   cp dev/SigDrive17.scala src/main/scala/graft/ && \
//     sbt "runMain graft.SigDrive17" && rm src/main/scala/graft/SigDrive17.scala
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.SigCatalog

object SigDrive17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def files(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.startsWith("part-")) 1 else 0
      walk(new java.io.File(root))
    }

    // history: 500k even ids; sh = xxhash64 of the id — full 64-bit
    // dispersion, so band buckets fill uniformly (65536 values/band)
    def sigsOf(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      ids.toDF("doc_id")
        .select(col("doc_id"), xxhash64(concat(lit("sg|"), col("doc_id"))).as("sh"))

    import spark.implicits._
    val histN = 500000L
    val hist = sigsOf(spark.range(0, 2 * histN, 2).as[java.lang.Long])
    SigCatalog.drop(spark, SigCatalog.land(spark, hist.limit(1), "drive17"))
    val (cat, tLand) = time {
      val c = SigCatalog.land(spark, hist, "drive17")
      spark.table(c.bandsT).count()
      c
    }
    println(f"land ${histN}%d sigs: $tLand%.2f s, files=${files(cat.root)}%d")

    // 8 appends of 25k each (odd ids 1M.., distinct words)
    val appendTimes = (1 to 8).map { i =>
      val ids = spark.range(2 * histN + i * 50000L + 1,
        2 * histN + i * 50000L + 50001L, 2).as[java.lang.Long]
      val (_, t) = time(SigCatalog.append(spark, sigsOf(ids), cat, ingestId = i))
      t
    }
    println(f"appends (25k each): ${appendTimes.map(t => f"$t%.2f").mkString(", ")} s")

    // batch: 25k docs; every 10th is a d=1 retouch of a history word —
    // half aimed at the landing, half at appended partitions
    val batchIds = spark.range(9000001L, 9050001L, 2).as[java.lang.Long]
    val batch = sigsOf(batchIds)
      .withColumn("tgt",
        when(col("doc_id") % 20 === 1, (col("doc_id") % histN) * 2)  // landing
        .when(col("doc_id") % 20 === 11,
          lit(2 * histN) + (col("doc_id") % 8 + 1) * 50000L + col("doc_id") % 100 * 2 + 1)  // appends
        .otherwise(lit(null)))
      .select(col("doc_id"),
        when(col("tgt").isNotNull,
          xxhash64(concat(lit("sg|"), col("tgt"))).bitwiseXOR(lit(1L)))
          .otherwise(col("sh")).as("sh"))

    val (v1, tScreen1) = time {
      SigCatalog.screen(spark, batch, cat).collect()
    }
    println(f"screen 25k batch @ 9 partitions: $tScreen1%.2f s, verdicts=${v1.length}%d, " +
      f"files=${files(cat.root)}%d")

    val (_, tCompact) = time(SigCatalog.compact(spark, cat, upToIngestId = 8))
    val (v2, tScreen2) = time {
      SigCatalog.screen(spark, batch, cat).collect()
    }
    val equal = v1.map(_.toString).sorted.sameElements(v2.map(_.toString).sorted)
    println(f"compact(8): $tCompact%.2f s; screen @ compacted: $tScreen2%.2f s, " +
      f"verdicts=${v2.length}%d, bit-equal=$equal%b, files=${files(cat.root)}%d")

    SigCatalog.drop(spark, cat)
    spark.stop()
  }
}
