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

  test("forkedRep returns None for a query that does not exist") {
    // the child runs an empty filtered sweep: no per-query time to
    // parse, and the parent must degrade to None (-> in-process
    // fallback), never invent a number
    val t = Bench.forkedRep("no_such_query_xyz", "/root/testdata/sf0.001", "2")
    assert(t.isEmpty)
  }
}
