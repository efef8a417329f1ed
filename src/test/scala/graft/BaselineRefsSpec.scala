package graft

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE_REFS.json is the bench guard's primary reference source
  * as of round 19 (generated from BASELINE.md's §4 table by
  * dev/gen_baseline_refs.py). This spec pins the switchover: the JSON
  * and the markdown table must agree row for row, and the guard must
  * actually read the JSON — so a ref minted into only one of the two
  * files fails loudly here instead of silently drifting.
  */
class BaselineRefsSpec extends AnyFunSuite {

  private def mdTable: Map[String, Double] = {
    val src = scala.io.Source.fromFile("/root/repo/BASELINE.md")(scala.io.Codec.UTF8)
    try src.getLines().flatMap { line =>
      line.split("\\|").map(_.trim).filter(_.nonEmpty) match {
        case Array(n, v) => scala.util.Try(n -> v.toDouble).toOption
        case _ => None
      }
    }.toMap
    finally src.close()
  }

  private def jsonRefs: Map[String, (Double, String)] = {
    val rx = java.util.regex.Pattern.compile(
      "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{[^}]*\"ref\"\\s*:\\s*([0-9.]+)[^}]*\"regime\"\\s*:\\s*\"(sweep|isolated)\"")
    val src = scala.io.Source.fromFile("/root/repo/BASELINE_REFS.json")(scala.io.Codec.UTF8)
    try src.getLines().flatMap { line =>
      val m = rx.matcher(line)
      if (m.find()) Some(m.group(1) -> (m.group(2).toDouble, m.group(3)))
      else None
    }.toMap
    finally src.close()
  }

  test("BASELINE_REFS.json agrees with BASELINE.md's table row for row") {
    val table = mdTable
    val json = jsonRefs
    assert(table.nonEmpty, "markdown table parse came up empty")
    assert(json.keySet === table.keySet,
      s"key drift: json-only=${json.keySet -- table.keySet} " +
        s"table-only=${table.keySet -- json.keySet}")
    table.foreach { case (q, ref) =>
      assert(json(q)._1 === ref, s"$q: json ${json(q)._1} != table $ref")
    }
    // every row carries a valid regime (the addendum-17 discipline:
    // compare like with like)
    assert(json.values.forall(v => v._2 == "sweep" || v._2 == "isolated"))
  }

  test("every JSON row's oracle class matches SparkEntry.oracleSql (the runtime truth)") {
    // the generator derives "sql"|"rows-only" by scanning the query
    // packs' source; this re-derivation from the RUNTIME oracle map
    // makes the artifact self-describing without letting the scan rot
    val rx = java.util.regex.Pattern.compile(
      "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{[^}]*\"oracle\"\\s*:\\s*\"(sql|rows-only)\"")
    val src = scala.io.Source.fromFile("/root/repo/BASELINE_REFS.json")(scala.io.Codec.UTF8)
    val classes =
      try src.getLines().flatMap { line =>
        val m = rx.matcher(line)
        if (m.find()) Some(m.group(1) -> m.group(2)) else None
      }.toMap
      finally src.close()
    assert(classes.nonEmpty, "no oracle classes in BASELINE_REFS.json — regenerate it")
    assert(classes.keySet === jsonRefs.keySet,
      "some rows lack an oracle class — regenerate BASELINE_REFS.json")
    val sqlGates = SparkEntry.oracleSql.keySet
    classes.foreach { case (q, cls) =>
      val want = if (sqlGates(q)) "sql" else "rows-only"
      assert(cls === want, s"$q: artifact says $cls, runtime oracle map says $want")
    }
  }

  test("the bench guard reads the JSON, not the markdown") {
    val table = mdTable
    val (refs, src) = Bench.baseline(table.keySet)
    assert(src.endsWith("BASELINE_REFS.json"),
      s"guard fell back to $src — regenerate BASELINE_REFS.json")
    assert(refs === table)
  }

  test("every driver-gate query has a reference (or is explicitly new this session)") {
    // a gate added without minting its ref leaves the guard blind on
    // that row; surface the gap as a list the round's close must empty
    val missing = SparkEntry.queries.keySet -- mdTable.keySet
    // new gates minted later in the SAME session may transiently
    // appear here; the round-close discipline (mint + regen + rerun
    // this spec) empties it
    if (missing.nonEmpty)
      info(s"rows awaiting first references: ${missing.toSeq.sorted.mkString(", ")}")
    assert(missing.size <= 8,
      s"too many unminted refs — mint before adding more gates: $missing")
  }
}
