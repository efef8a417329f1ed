// Dev-only: the bzip2 wire decode at OPERATOR volume (ig_bz2_wire
// bounds its corpus to 300 rows; this measures compress+decompress+TLV
// over the full events table at sf0.1 and the 1M-row sf1 replica).
// Run via:
//   cp dev/Bz2Drive14.scala src/main/scala/graft/ && \
//     sbt "runMain graft.Bz2Drive14" && rm src/main/scala/graft/Bz2Drive14.scala
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bz2Drive14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bz2v] $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup pass first (JIT), then the two scales. The wire is LANDED
    // first (repartitioned so the scan is splittable — the driver's
    // single-row-group events.parquet serializes everything onto one
    // task otherwise) and decode is timed separately: compression is
    // the implants' cost, decode is the analytics engine's.
    for (dir <- Seq("/root/testdata/sf0.001",
        "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val wireDir = s"/tmp/graft_bz2_wire/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      // repartition the EVENTS (before the compress projection): the
      // driver's single-row-group parquet is unsplittable, and a
      // repartition above the projection would leave all bz2 work on
      // that one scan task
      timed(s"land compressed wire (64 slices) $dir")(
        graft.plans.BeaconPipeline.compressedWireCorpus(
            Tables.events(spark, dir).repartition(64))
          .write.mode("overwrite").parquet(wireDir))
      val d = graft.plans.BeaconPipeline.decodeWirePayloads(
        spark.read.parquet(wireDir)) // NO row slice: full corpus
      val r = timed(s"decode-only from landed wire      $dir")(
        d.agg(count(lit(1)),
          sum(when(col("magic_ok") && col("shrunk"), 1L).otherwise(0L)),
          sum(col("blob_len").cast("bigint"))).head)
      println(s"[bz2v]   rows=${r.getLong(0)} receipts_ok=${r.getLong(1)} blob_bytes=${r.getLong(2)}")
    }
    spark.stop()
  }
}
