// Dev-only measurement of the interval join's two plan shapes at
// 100x gate row counts: 1M events x 4,000 intervals, (a) the naive
// non-equi containment join (BroadcastNestedLoopJoin — every event
// against every interval) vs (b) the binned equi join shipped as
// Intervals.intervalJoin's shape. Result equality asserted.
// Run via:
//   cp dev/IntervalDrive17.scala src/main/scala/graft/ && \
//     sbt "runMain graft.IntervalDrive17" && rm src/main/scala/graft/IntervalDrive17.scala
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object IntervalDrive17 {
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

    // 1M events over ~1 year (30s cadence), 4k intervals 10-25 min
    // wide spawned every 250th event — the sf1-ish density of the
    // gate's construction
    val nEv = sys.env.getOrElse("NEV", "1000000").toLong
    val ev = spark.range(0, nEv)
      .select(col("id").as("event_id"),
        (col("id") * 30000000L + pmod(xxhash64(col("id")), lit(30000000L))).as("tus"))
      .repartition(32).persist()
    val iv = ev.filter(col("event_id") % 250 === 0)
      .select(col("event_id").as("interval_id"), col("tus").as("start_us"),
        (col("tus") + (lit(10) + col("event_id") % 4 * 5) * 60L * 1000000L).as("end_us"))
      .persist()
    println(s"events=${ev.count()} intervals=${iv.count()}")

    val (naive, tN) = time {
      ev.join(iv, col("tus") >= col("start_us") && col("tus") < col("end_us"))
        .count()
    }
    println(f"naive non-equi join:  $tN%.2f s, pairs=$naive")

    val binUs = 30L * 60 * 1000000
    val (binned, tB) = time {
      val evb = ev.withColumn("bin", expr(s"tus div $binUs"))
      val ivb = iv.select(col("interval_id"), col("start_us"), col("end_us"),
        explode(sequence(expr(s"start_us div $binUs"),
          expr(s"(end_us - 1) div $binUs"))).as("bin"))
      evb.join(ivb, Seq("bin"))
        .filter(col("tus") >= col("start_us") && col("tus") < col("end_us"))
        .count()
    }
    println(f"binned equi join:     $tB%.2f s, pairs=$binned, speedup=${tN / tB}%.1fx")
    assert(naive == binned, s"shape changed the answer: $naive vs $binned")
    spark.stop()
  }
}
