package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the shapes AQE can't fix on its own
  * (AQE's skew-join split works for sort-merge joins; a skewed
  * aggregation or an exploding hot key in a hash join still needs
  * salting).
  *
  * Salting trades one shuffle for two balanced ones: the hot side gets
  * a uniform salt in [0, buckets), the other side is replicated across
  * every salt value, and results are exact because the salt never
  * leaves the join/agg key.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row
    * content (never rand() — retries/speculation must agree).
    */
  def salt(c: Column, buckets: Int): Column = pmod(xxhash64(c), lit(buckets))

  /** Two-phase aggregation for a skewed group key: partial aggregate on
    * (key, salt), then final on key. `partialAggs` and `finalAggs` must
    * be algebraic pairs (e.g. count→sum, sum→sum, min→min).
    */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, buckets: Int)(
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.groupBy(key.as("key"), salt(saltSource, buckets).as("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("key"))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Skew-safe join against an IN-PLAN dim — the round-10 rehearsal's
    * blocking condition (PLANS.md): AQE's `OptimizeSkewedJoin` only
    * matches `SMJ(Sort(shuffle), Sort(shuffle))`, and a dim computed
    * in the same plan (e.g. an aggregate over the fact) pipelines
    * between its shuffle and the join, so the skewed fact partition is
    * never split and one task eats the hot key. Cutting the dim's
    * lineage with an eager `localCheckpoint` (dims are small by
    * definition; blocks stay on executors, nothing is collected to
    * the driver) turns it into a fresh scan that re-shuffles for the
    * join, restoring the shape the skew split can match.
    *
    * Prefer LANDING a reused dim (`plans/BucketedLayout`) — that is
    * the production discipline; this is the in-flight variant for
    * one-shot dims. For shapes AQE still can't split (non-SMJ joins,
    * skewed aggregations) use [[saltedJoin]]/[[saltedAgg]].
    *
    * Third blocking condition (pinned in SkewSpec): the split is also
    * REJECTED when a downstream operator reuses the join's hash
    * distribution — e.g. `groupBy(key)` straight after the join —
    * because splitting the partition would break the required
    * distribution. If the post-join aggregation is on the join key,
    * the skew split cannot engage regardless of dim shape; route the
    * hot side through [[saltedAgg]] instead.
    *
    * Caveats of the lineage cut (know what you're buying):
    *  - EAGER: the checkpoint launches a Spark job at
    *    DataFrame-CONSTRUCTION time, before the caller triggers any
    *    action — this builder is not a pure plan assembler.
    *  - `localCheckpoint` blocks are NON-REPLICATED executor blocks
    *    and lineage is truncated: losing an executor afterwards fails
    *    the downstream query instead of recomputing. Fine for
    *    interactive/one-shot work; for a long-running production job
    *    pass `reliable = true`, which uses a filesystem `checkpoint`
    *    (survives executor loss; requires
    *    `sparkContext.setCheckpointDir` and costs one small write of
    *    the dim).
    */
  def skewSafeDimJoin(fact: DataFrame, dim: DataFrame, key: String,
      joinType: String = "inner", reliable: Boolean = false): DataFrame = {
    val cut = if (reliable) dim.checkpoint(true) else dim.localCheckpoint(true)
    fact.join(cut, Seq(key), joinType)
  }

  /** Salted equi-join: `left` (skewed) gets a salt per row; `right`
    * is exploded across all `buckets` salt values so every
    * (key, salt) pair finds its match. Exact for inner/left joins on
    * unique right keys.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("_salt", salt(monotonically_increasing_id(), buckets))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
