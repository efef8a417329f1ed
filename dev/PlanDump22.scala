package graft

import org.apache.spark.sql.SparkSession

/** Round-22 plan capture: dump `.explain("formatted")` for a set of
  * declared queries to plans/r22/<name>_<tag>.txt, so before/after
  * plan-shape claims in OPTIMIZATION_r21.md are auditable without
  * running Spark.
  *
  * Usage: runMain graft.PlanDump22 <tag> <name1,name2,...>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  *
  * Note: streaming replay gates execute their stream inside the
  * builder; their dumped plan is the sink read-back only — their
  * per-micro-batch plan shape is documented separately.
  */
object PlanDump22 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = new java.io.File("plans/r22")
    outDir.mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            spark.sparkContext.setJobDescription(s"plandump:$name")
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val w = new java.io.PrintWriter(
              new java.io.File(outDir, s"${name}_$tag.txt"), "UTF-8")
            try w.println(plan) finally w.close()
            System.err.println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: $e")
          } finally {
            Shared.releaseAll(spark)
            spark.catalog.clearCache()
          }
      }
    }
    spark.stop()
  }
}
