package graft

import org.apache.spark.sql.SparkSession

/** Round-22 phase-timing probe: break the expensive gates into their
  * phases and time each one in a bench-shaped session, so the
  * optimization targets the phase that actually costs, not the one
  * that looks expensive in the code.
  *
  * Usage: runMain graft.Probe22 <probe> [probe...]
  *   ann     — ivfCentroidsConverged round-by-round timing
  *   stream  — tx_stream_spans / ig_stream_sessions phase timing
  *   beacon  — ig_beacon_dag phase timing
  *   scene   — mm_scene_cuts phase timing
  */
object Probe22 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe22] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
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
    // bench-shaped warmup
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }

    args.foreach {
      case "ann" =>
        (1 to 3).foreach { rep =>
          t(s"ann_ivf_converged full (rep $rep)") {
            SparkEntry.queries("ann_ivf_converged")(spark, sfDir).count()
          }
          Shared.releaseAll(spark); spark.catalog.clearCache()
        }
        (1 to 2).foreach { rep =>
          t(s"ann_pq_converged full (rep $rep)") {
            SparkEntry.queries("ann_pq_converged")(spark, sfDir).count()
          }
          Shared.releaseAll(spark); spark.catalog.clearCache()
        }
      case "stream" =>
        Seq("tx_stream_spans", "ig_stream_sessions", "ig_stream_ingest",
          "mm_stream_phash", "tx_stream_classifier").foreach { q =>
          (1 to 2).foreach { rep =>
            t(s"$q (rep $rep)") { SparkEntry.queries(q)(spark, sfDir).count() }
            Shared.releaseAll(spark); spark.catalog.clearCache()
          }
        }
      case "beacon" =>
        (1 to 3).foreach { rep =>
          t(s"ig_beacon_dag (rep $rep)") {
            SparkEntry.queries("ig_beacon_dag")(spark, sfDir).count()
          }
          Shared.releaseAll(spark); spark.catalog.clearCache()
        }
        // synthesis only vs synthesis+decode
        val b = graft.plans.BeaconPipeline.syntheticBeacons(spark, sfDir)
        (1 to 2).foreach { rep =>
          t(s"syntheticBeacons only (rep $rep)") {
            b.write.format("noop").mode("overwrite").save()
          }
        }
        val dec = graft.plans.BeaconPipeline.decode(b)
        (1 to 2).foreach { rep =>
          t(s"synth+decode (rep $rep)") {
            dec.write.format("noop").mode("overwrite").save()
          }
        }
      case "scene" =>
        (1 to 3).foreach { rep =>
          t(s"mm_scene_cuts (rep $rep)") {
            SparkEntry.queries("mm_scene_cuts")(spark, sfDir).count()
          }
          Shared.releaseAll(spark); spark.catalog.clearCache()
        }
      case "pipeline" =>
        (1 to 2).foreach { rep =>
          var last = System.nanoTime()
          t(s"tx_pipeline_full (rep $rep)") {
            graft.queries.TrainingPack.pipelineFull(spark, sfDir,
              stageHook = { (label, _) =>
                val now = System.nanoTime()
                System.err.println(f"[probe22]   stage $label%-24s ${(now - last) / 1e9}%7.3f s")
                last = now
              }).count()
          }
          Shared.releaseAll(spark); spark.catalog.clearCache()
        }
      case other => System.err.println(s"[probe22] unknown probe: $other")
    }
    spark.stop()
  }
}
