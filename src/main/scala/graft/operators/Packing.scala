package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the dataloader-final stage: documents fill
  * fixed-size token bins per output shard in a deterministic order
  * (greedy running fill: `bin = prefix_sum(weight) div binSize`).
  *
  * TWO-PHASE DISTRIBUTED PREFIX SUM (the [[Sampling.shardShuffle]]
  * treatment applied to the packing family): a naive per-shard
  * running-sum window sorts corpus/nShards rows in ONE task per shard
  * — 12.5 TB/task at 100 TB with 8 shards. Instead the order key is
  * split into `nRanges` order-compatible ranges (`order div width`,
  * width derived from the max order value via a 1-row broadcast — div
  * is monotone, so range order composes with the in-range order), the
  * running sum is computed per (shard, range), and each range's
  * starting offset is folded from a broadcast ≤ nRanges·nShards-row
  * totals frame. Values are identical to the single-window semantics
  * the oracles replay (a prefix sum is split-invariant); parallelism
  * is nRanges × nShards regardless of the shard count.
  *
  * Requires a non-negative BIGINT-castable order column (ids and
  * within-shard positions both are) — enforced at runtime: the range
  * key divides toward zero, so a NEGATIVE order value would silently
  * collapse into range 0 out of order and corrupt cum_before/bin.
  * The min rides the same 1-row width aggregate (no extra pass) and
  * a violation raises from inside the range expression. Callers with
  * an expensive input should checkpoint it first: the offsets (and
  * width) frames are BROADCAST sides, which Spark materializes
  * before the main stages fill lazy caches (PLANS.md round-19 plan
  * rule), and the input feeds three consumers (the width aggregate,
  * the offsets branch, the main branch) — an unpinned expensive
  * weight projection computes ~twice.
  */
object Packing {

  def packBins(df: DataFrame, shardCol: String, orderCol: String,
      weightCol: String, binSize: Long, nRanges: Int = 256): DataFrame = {
    require(binSize >= 1, s"packBins: binSize must be >= 1, got $binSize")
    require(nRanges >= 1, s"packBins: nRanges must be >= 1, got $nRanges")
    val mx = df.agg(coalesce(max(col(orderCol)).cast("long"), lit(0L)).as("_mx"),
      coalesce(min(col(orderCol)).cast("long"), lit(0L)).as("_mn"))
    val keyed = df.crossJoin(broadcast(mx))
      .withColumn("_rng", expr(
        s"IF(_mn < 0, CAST(raise_error('packBins: order column $orderCol " +
          "has negative values - div-toward-zero would corrupt the range " +
          "key') AS BIGINT), " +
          s"CAST($orderCol AS BIGINT) div " +
          s"greatest(CAST(1 AS BIGINT), (_mx + $nRanges) div $nRanges))"))
      .drop("_mx", "_mn")
    // phase 1: per-(shard, range) weight totals -> range start offsets
    val wOff = Window.partitionBy(shardCol).orderBy("_rng")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(shardCol, "_rng")
      .agg(sum(col(weightCol)).as("_t"))
      .withColumn("_off", coalesce(sum("_t").over(wOff), lit(0L)))
      .drop("_t")
    // phase 2: running sum inside each (shard, range) + the offset
    val wLoc = Window.partitionBy(shardCol, "_rng").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq(shardCol, "_rng"))
      .withColumn("cum_before",
        col("_off") + coalesce(sum(col(weightCol)).over(wLoc), lit(0L)))
      .withColumn("bin", expr(s"cum_before div CAST($binSize AS BIGINT)"))
      .drop("_rng", "_off")
  }
}
