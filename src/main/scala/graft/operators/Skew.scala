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
