package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the scale
  * factor in SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A warmup action runs first so the session-initialization cost
  * (codegen compiler, parquet footer cache, broadcast machinery)
  * doesn't land on whichever query happens to execute first; queries
  * then run in sorted name order for stable attribution across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try SparkEntry.queries.head._2(spark, sfDir).count() // warmup
    catch { case _: Throwable => () }

    // median of 3 runs per query: single-shot timings swing 2-5x from
    // JIT/GC/page-cache noise at sub-second scale, which makes
    // round-over-round per-query deltas unadjudicable
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // release this query's persisted subtrees (dedup shingles,
      // exploded tokens) so cache blocks don't pile up and skew later
      // queries
      Shared.releaseAll(spark)
      spark.catalog.clearCache()
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
