package graft

/** Round-22 diagnostic: exercise Bench.forkedRep end-to-end from a
  * `runMain` parent — the exact invocation shape the driver's bench
  * uses — after the round-21 driver run showed all 9 forked
  * adjudication reps dying on a child classpath missing
  * scala-library while BenchForkSpec (an `sbt test` parent) passed.
  * Prints the assembled child classpath's shape and the parsed rep
  * time so a broken chain is diagnosable from one run.
  */
object ForkProbe22 {
  def main(args: Array[String]): Unit = {
    val cp = Bench.childClasspath()
    val entries = cp.split(java.io.File.pathSeparator)
    System.err.println(s"[forkprobe] parent java.class.path entries: " +
      System.getProperty("java.class.path", "").split(java.io.File.pathSeparator).length)
    System.err.println(s"[forkprobe] child classpath entries: ${entries.length}")
    System.err.println(s"[forkprobe] has scala-library: ${cp.contains("scala-library")}")
    System.err.println(s"[forkprobe] has spark-sql: ${cp.contains("spark-sql")}")
    System.err.println(s"[forkprobe] has glob fallback: ${entries.exists(_.endsWith("/*"))}")
    val t0 = System.nanoTime()
    val r = Bench.forkedRep("dq01_scan_filter_project", "/root/testdata/sf0.001", "2")
    System.err.println(f"[forkprobe] forkedRep result: $r (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    if (r.isEmpty) sys.exit(1)
  }
}
