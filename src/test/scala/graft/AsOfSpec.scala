package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** Union-merge as-of join: semantics on a hand-built fixture, hot-key
  * behavior, and the plan shape that makes it scale — one shuffle on
  * the key and no join operator (the range-join-then-rank alternative
  * materializes |events/key| x |configs/key| rows per key).
  */
class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def events(rows: (Long, Long, Long)*) = // (event_id, key, ts)
    rows.toDF("event_id", "key", "ts")

  private def configs(rows: (Long, Long, String)*) = // (cfg_ts, key, payload)
    rows.toDF("cfg_ts", "cfg_key", "payload")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOf.join(l, r, "key", "cfg_key", "ts", "cfg_ts",
      rightTieBreak = Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq

  test("latest-not-after semantics, equal-ts config visible, unmatched null") {
    val l = events((1L, 7L, 10L), (2L, 7L, 20L), (3L, 7L, 5L), (4L, 8L, 50L))
    val r = configs((10L, 7L, "at10"), (15L, 7L, "at15"), (30L, 7L, "at30"),
      (60L, 8L, "late"))
    assert(run(l, r) === Seq(
      1L -> Some("at10"), // config stamped exactly at event ts matches
      2L -> Some("at15"), // latest <= 20
      3L -> None,         // no config yet
      4L -> None))        // key 8's only config is after the event
  }

  test("ties on config ts resolve to the greatest tie-break") {
    val l = events((1L, 7L, 10L))
    val r = configs((5L, 7L, "a"), (5L, 7L, "z"), (5L, 7L, "m"))
    assert(run(l, r) === Seq(1L -> Some("z")))
  }

  test("null-key and null-ts configs never match; null-key events keep nulls") {
    val l = events((1L, 7L, 10L)).unionByName(
      Seq((2L, Option.empty[Long], 10L)).toDF("event_id", "key", "ts"))
    val r = Seq(
      (Some(5L), Some(7L), "good"),
      (Option.empty[Long], Some(7L), "null_ts"),
      (Some(5L), Option.empty[Long], "null_key"))
      .toDF("cfg_ts", "cfg_key", "payload")
    assert(run(l, r) === Seq(1L -> Some("good"), 2L -> None))
  }

  test("mixed ts types merge on the WIDER type: date events never see same-day-later configs") {
    // left DATE, right TIMESTAMP: casting right down to DATE would make
    // a config stamped 12:00 visible to the day's 00:00 event — the
    // widening contract keeps rightTs <= leftTs on the timestamp line
    val l = Seq((1L, 7L, "2024-03-02"))
      .toDF("event_id", "key", "d").select(col("event_id"), col("key"),
        col("d").cast("date").as("ts"))
    val r = Seq((7L, "2024-03-02 12:00:00", "late"), (7L, "2024-03-01 23:00:00", "early"))
      .toDF("cfg_key", "t", "payload")
      .select(col("cfg_key"), col("t").cast("timestamp").as("cfg_ts"), col("payload"))
    val out = AsOf.join(l, r, "key", "cfg_key", "ts", "cfg_ts")
      .select("event_id", "payload").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq((1L, Some("early"))))
    // incompatible type combinations are a plan-time error, not a cast
    val bad = Seq((1L, 7L, 5L)).toDF("event_id", "key", "ts")
    intercept[IllegalArgumentException] { AsOf.join(bad, r, "key", "cfg_key", "ts", "cfg_ts") }
  }

  test("hot key stays linear: 10k events x 1k configs on ONE key") {
    // the quadratic plan would build 10M intermediate rows for this
    // key; union-merge sorts 11k rows once
    val l = (0 until 10000).map(i => (i.toLong, 1L, i.toLong * 10)).toDF("event_id", "key", "ts")
    val r = (0 until 1000).map(j => (j.toLong * 100 + 1, 1L, s"c$j")).toDF("cfg_ts", "cfg_key", "payload")
    val t0 = System.nanoTime()
    val out = AsOf.join(l, r, "key", "cfg_key", "ts", "cfg_ts")
      .select("event_id", "payload").as[(Long, Option[String])].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length === 10000)
    val byId = out.toMap
    assert(byId(0L) === None)              // ts=0, first config at ts=1
    assert(byId(5L) === Some("c0"))        // ts=50 >= 1, < 101
    assert(byId(9999L) === Some("c999"))   // ts=99990 >= 99901
    assert(secs < 60, s"hot-key as-of took ${secs}s — fanout suspected")
  }

  test("plan: no join operator, exactly one hash-partition shuffle") {
    val l = events((1L, 7L, 10L), (2L, 8L, 20L))
    val r = configs((5L, 7L, "a"), (15L, 8L, "b"))
    val df = AsOf.join(l, r, "key", "cfg_key", "ts", "cfg_ts",
      rightTieBreak = Seq("payload"))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    for (bad <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!s.contains(bad), s"join operator in as-of plan:\n$s")
    // AQE wraps finished stages in ShuffleQueryStage leaves, so count
    // exchanges in the rendered plan rather than via collect
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(hashShuffles === 1, s"expected one key shuffle:\n$s")
  }
}
