package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Pins the round-10 skew rehearsal's blocking condition and its
  * workaround as an executable contract (PLANS.md "skew rehearsal"):
  *
  *  - a dim computed IN-PLAN (an aggregate over the fact) defeats
  *    AQE's OptimizeSkewedJoin — the hot fact partition is never
  *    split;
  *  - [[Skew.skewSafeDimJoin]] (lineage-cut dim) restores the
  *    matchable SMJ(Sort(shuffle), Sort(shuffle)) shape and the split
  *    ENGAGES (`skew=true` in the executed plan);
  *  - both shapes return identical rows.
  *
  * The corpus is synthesized in-test (one key owning ~40% of a padded
  * fact table) with the rehearsal's scaled-down thresholds — at 100 TB
  * the hot partition is GBs and the 256 MB default fires on its own.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `f` under rehearsal-scale skew thresholds, restoring every
    * conf afterwards (suites share the JVM's session).
    */
  private def withSkewConfs[A](f: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Skewed fact: key 0 owns ~40% of 200k padded rows; the rest spread
    * over 999 keys. Padding pushes the hot shuffle partition well past
    * the scaled 64k threshold and 5x the median partition.
    */
  private def skewedFact: DataFrame =
    spark.range(200000).select(
      when(col("id") % 5 <= 1, 0L).otherwise(pmod(col("id"), lit(999L)) + 1L).as("k"),
      (col("id") * 31 % 997).as("v"),
      // incompressible per-row payload: column pruning must not strip
      // it (the agg consumes it) and lz4 can't shrink it under the
      // scaled skew threshold
      md5(col("id").cast("string")).as("pad"))

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  test("in-plan agg dim blocks the skew split; skewSafeDimJoin restores it, rows identical") {
    withSkewConfs {
      val fact = skewedFact
      def dimQ: DataFrame = fact.groupBy("k").agg(avg(col("v")).as("va"))
      // downstream must NOT require the join key's partitioning: a
      // groupBy("k") right after the join reuses the SMJ's hash
      // distribution, and AQE REJECTS a skew split that would break a
      // required distribution (third blocking condition, pinned below
      // by construction: global agg -> split allowed). pad rides into
      // the aggregate so column pruning can't shrink the hot partition
      // under the scaled threshold.
      def shape(joined: DataFrame): DataFrame =
        joined.filter(col("v") > col("va"))
          .agg(count(lit(1)).as("n"), sum(crc32(col("pad"))).as("psum"))

      // 1. the blocked shape: dim pipelined from its own aggregate —
      //    OptimizeSkewedJoin finds no SMJ(Sort(shuffle), Sort(shuffle))
      val blocked = shape(fact.join(dimQ, Seq("k")))
      val blockedPlan = finalPlan(blocked)
      assert(blockedPlan.contains("SortMergeJoin"),
        s"rehearsal shape must be an SMJ (broadcast disabled):\n$blockedPlan")
      assert(!blockedPlan.contains("skew=true"),
        "the blocking condition disappeared - if Spark learned to split " +
          "through in-plan aggs, retire skewSafeDimJoin")

      // 2. the workaround: lineage-cut dim -> the split ENGAGES
      val fixed = shape(Skew.skewSafeDimJoin(fact, dimQ, "k"))
      val fixedPlan = finalPlan(fixed)
      assert(fixedPlan.contains("skew=true"),
        s"skewSafeDimJoin must restore the skew split:\n$fixedPlan")

      // 3. semantics unchanged: same survivor count and pad checksum
      val a = blocked.collect().map(r => (r.getLong(0), r.getLong(1)))
      val b = fixed.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(a.sameElements(b), s"workaround changed the answer: ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("third blocking condition: groupBy on the join key downstream defeats the split even with a cut dim") {
    withSkewConfs {
      val fact = skewedFact
      val dimQ = fact.groupBy("k").agg(avg(col("v")).as("va"))
      // identical join to the engaging shape above, but re-aggregated
      // BY THE JOIN KEY: the aggregate requires hashpartitioning(k),
      // which the join's output satisfies — splitting the skewed
      // partition would break it, so AQE backs out of the skew split.
      // If this ever starts engaging, Spark learned to re-shuffle after
      // split joins — update the scaladoc's guidance toward saltedAgg.
      val byKey = Skew.skewSafeDimJoin(fact, dimQ, "k")
        .filter(col("v") > col("va"))
        .groupBy("k").agg(count(lit(1)).as("n"), max(col("pad")).as("pmax"))
      val plan = finalPlan(byKey)
      assert(plan.contains("SortMergeJoin"), s"shape must stay an SMJ:\n$plan")
      assert(!plan.contains("skew=true"),
        "downstream keyed agg no longer blocks the skew split - " +
          "revisit Skew.skewSafeDimJoin's guidance (saltedAgg route)")
    }
  }

  test("saltedJoin stays exact on the same skewed corpus (the non-SMJ fallback route)") {
    withSkewConfs {
      val fact = skewedFact
      val dim = fact.groupBy("k").agg(avg(col("v")).as("va")).localCheckpoint(true)
      val plain = fact.join(dim, Seq("k")).count()
      val salted = Skew.saltedJoin(fact, dim, "k", buckets = 16).count()
      assert(plain == salted, s"salted join changed cardinality: $plain vs $salted")
    }
  }
}
