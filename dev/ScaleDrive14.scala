// Dev-only round-14 scale rehearsal (verdict items 6 + 8): sf0.1 → sf1
// receipts for the two round-13 gates without one, measured at
// OPERATOR volume (the gates themselves bound their corpora), plus the
// 10⁷-fingerprint sharded-Bloom receipt.
//   1. chunk → retransmit → reassemble over the FULL events table
//      (pair-key shuffles: (stream_id, offset) dedup + per-stream fold).
//   2. retention lifecycle: land day-partitioned, physically sweep aged
//      partitions, aggregate survivors.
//   3. bloomScreenSharded against a 10,000,000-fingerprint catalog:
//      does the auto-raise fire outside unit tests, and what do the
//      build/probe stages cost?
// Run via:
//   python3 dev/make_sf1.py   # if /tmp/graft_sf1 is stale
//   cp dev/ScaleDrive14.scala src/main/scala/graft/ && \
//     sbt "runMain graft.ScaleDrive14" && rm src/main/scala/graft/ScaleDrive14.scala
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Reassembly}

object ScaleDrive14 {
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
      println(f"[scale14] $label%-58s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // sf0.001 pass first: JIT/codegen warmup so the sf0.1 -> sf1 wall
    // ratio measures DATA scaling, not compiler state
    for (dir <- Seq("/root/testdata/sf0.001",
        "/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      println(s"[scale14] ===== $dir =====")

      // ---- 1. chunk/reassembly at operator volume -------------------
      // every event one stream; payload 20-45 bytes -> 3-7 chunks of 7B
      // like the gate, every 3rd chunk duplicated
      val blobs = Tables.events(spark, dir).select(
        col("event_id").cast("string").as("stream_id"),
        concat(lit("rs"), col("event_id").cast("string"), lit("|"),
          expr("repeat('ab', CAST(event_id % 13 AS INT))"), col("event_type"))
          .cast("binary").as("blob"))
      val re = Reassembly.reassemble(
        Reassembly.withRetransmits(Reassembly.chunk(blobs, 7), 7))
      val (n, contig) = timed("1. chunk+retransmit+reassemble, full corpus")(
        re.agg(count(lit(1)), sum(when(col("contiguous"), 1L).otherwise(0L)))
          .head match { case r => (r.getLong(0), r.getLong(1)) })
      println(s"[scale14] 1. streams reassembled: $n, contiguous: $contig")

      // ---- 2. retention lifecycle at volume --------------------------
      val root = s"/tmp/graft_retain_rehearsal/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}"
      org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = Tables.events(spark, dir)
      val cut = ev.agg(date_sub(max(to_date(col("ts"))), 6)).head.getDate(0)
      timed("2a. land day-partitioned")(
        ev.withColumn("day", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("day").parquet(root))
      timed("2b. physical sweep of aged partitions")(
        graft.plans.Retention.sweep(spark, root, "day", cut.toString))
      val survivors = timed("2c. survivor aggregate")(
        spark.read.parquet(root).groupBy("day").agg(count(lit(1))).count())
      println(s"[scale14] 2. surviving days: $survivors (cutoff $cut)")
    }

    // ---- 3. sharded Bloom at 10^7 catalog fingerprints ---------------
    // catalog fps are md5 hex like the real DedupCatalog; the batch is
    // (doc_id, text) with half its texts already in the catalog.
    // nShards=1 exercises the AUTO-RAISE outside unit tests (13M-item
    // shard sizing exceeds the 4M runtime-filter cap -> raised to 4);
    // nShards=8 is the documented default at this volume.
    println(s"[scale14] ===== sharded bloom 10^7 =====")
    val catalog = spark.range(10000000L)
      .select(md5(concat(lit("cat"), col("id"))).as("fp")).localCheckpoint(true)
    val batch = spark.range(1000000L)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, concat(lit("cat"), col("id")))
          .otherwise(concat(lit("new"), col("id"))).as("text"))
      .localCheckpoint(true)
    for (nShards <- Seq(1, 8)) {
      val kept = timed(s"3. bloomScreenSharded(nShards=$nShards) build+probe")(
        Dedup.bloomScreenSharded(batch, catalog, nShards = nShards).count())
      println(s"[scale14] 3. nShards=$nShards survivors: $kept of 1000000 (expect 500000)")
      Shared.releaseAll(spark)
    }

    spark.stop()
  }
}
