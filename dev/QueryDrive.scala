// Dev-only query drive: runs named SparkEntry queries at a scale dir
// and prints row counts (plus replay_equal verdicts for the converged-
// trainer gates). Run via:
//   cp dev/QueryDrive.scala src/main/scala/graft/ && \
//   sbt "runMain graft.QueryDrive sf0.001 ann_ivf_converged ann_pq_converged" && \
//   rm src/main/scala/graft/QueryDrive.scala
package graft

object QueryDrive {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("ann_ivf_converged")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus).getOrCreate()
    GraftSession.registerAll(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (sf.startsWith("/")) sf else s"/root/testdata/$sf"
    for (n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val rows = df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val eqIdx = df.columns.indexOf("replay_equal")
      val extra = if (eqIdx >= 0)
        s" all_replay_equal=${rows.forall(_.getBoolean(eqIdx))}" +
          s" rounds=${rows.headOption.map(_.get(df.columns.indexOf("rounds_run"))).getOrElse("-")}"
      else ""
      println(f"DRIVE $n%s rows=${rows.length}%d secs=$secs%.2f$extra")
      Shared.releaseAll(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
