package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integration coverage for Bench's forked adjudication rep — the
  * machinery that replaced the in-process isolated re-measure after
  * two rounds of false above-bar verdicts. The helper forks a REAL
  * fresh JVM (classpath resolved from this JVM's code sources), runs
  * one raw single-rep Bench restricted to one query at the smoke
  * scale, and parses the measurement back; a regression anywhere in
  * the chain (classpath resolution, RAW-mode env plumbing, JSON
  * parsing, the child's errors flag) surfaces here instead of in a
  * round's committed bench artifact.
  */
class BenchForkSpec extends AnyFunSuite {

  test("forkedRep runs one raw rep in a fresh JVM and parses its time") {
    val t = Bench.forkedRep("dq01_scan_filter_project",
      "/root/testdata/sf0.001", "2")
    assert(t.isDefined, "forked rep failed — check /tmp/bench_adjudicate_err.log")
    assert(t.get > 0.0 && t.get < 120.0, s"implausible rep time: $t")
  }

  test("childClasspath carries the full runtime stack (scala-library, spark, graft classes)") {
    // the round-21 driver run's forked adjudication died 9/9 with
    // NoClassDefFoundError: scala/collection/immutable/Seq — the old
    // child classpath globbed only spark-sql's parent directory. The
    // assembled classpath must provide the scala runtime, spark, and
    // this build's classes no matter which parent (sbt test, sbt
    // runMain, bare java) resolved it.
    val cp = Bench.childClasspath()
    val entries = cp.split(java.io.File.pathSeparator)
    def covers(hint: String) = entries.exists(e =>
      e.contains(hint) || e.endsWith("/*"))
    assert(covers("scala-library"), s"no scala-library in: ${cp.take(400)}")
    assert(covers("spark-sql"), s"no spark-sql in: ${cp.take(400)}")
    assert(entries.exists(e => e.endsWith("classes") || e.contains("vault8hivespark") ||
      e.contains("graft")), s"no graft classes entry in: ${cp.take(400)}")
  }

  test("forkedRep returns None for a query that does not exist") {
    // the child runs an empty filtered sweep: no per-query time to
    // parse, and the parent must degrade to None (-> in-process
    // fallback), never invent a number
    val t = Bench.forkedRep("no_such_query_xyz", "/root/testdata/sf0.001", "2")
    assert(t.isEmpty)
  }

  test("stall sentinel: a planted r18-style stall window is detected, a flat series is not") {
    // the r18 contamination shape: a block of probes 2-8x the steady
    // value in the middle of an otherwise flat series
    val flat = (1 to 20).map(i => s"q$i" -> 0.03)
    assert(Bench.stallWindows(flat).isEmpty, "flat series must not flag")
    // the first probe is JIT-cold by construction: a slow "_start"
    // anchors the median but never flags
    assert(Bench.stallWindows(Seq("_start" -> 0.9) ++ flat).isEmpty,
      "cold first probe must not flag")
    val stalled = flat.take(8) ++ Seq("q9" -> 0.21, "q10" -> 0.15) ++
      flat.drop(10)
    val got = Bench.stallWindows(stalled)
    assert(got.map(_._1) === Seq("q9", "q10"), s"wrong windows: $got")
    // the reported median is the series floor, not the stall value
    assert(got.forall(_._3 === 0.03))
    // +-15% run noise never flags (the normal band from BASELINE.md)
    val noisy = (1 to 20).map(i => s"q$i" -> (if (i % 2 == 0) 0.034 else 0.027))
    assert(Bench.stallWindows(noisy).isEmpty, "normal-band noise must not flag")
    // too-short series: no floor, no verdicts
    assert(Bench.stallWindows(Seq("a" -> 1.0, "b" -> 99.0)).isEmpty)
  }
}
