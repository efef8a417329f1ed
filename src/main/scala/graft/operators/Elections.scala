package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-based rank elections — the ONE copy of the keep-cut
  * election rule shared by the LM head-cut (tx_lm_threshold) and the
  * classifier cut (tx_classifier_cut): calibrating "keep the best
  * X % per group" on a corpus must not sort the corpus; it runs on
  * the (group, score-bucket) HISTOGRAM — bounded rows — with one
  * cumulative window, and the elected threshold broadcasts back.
  * Rank-exact at bucket granularity, ties inclusive at the elected
  * bucket (the production trade: a corpus-sized per-group sort buys
  * the last 1e-3 of rank precision and nothing else).
  */
object Elections {

  /** Per-`grp` threshold: the largest `bkt` whose DESCENDING
    * cumulative count reaches `numer`/`denom` of the group total.
    * Input is any frame with one row per scored item; output is
    * (grp, b_threshold), group-count-sized — broadcast it.
    */
  def histogramThreshold(scored: DataFrame, grp: String, bkt: String,
      numer: Int = 7000, denom: Int = 10000): DataFrame = {
    val wCum = Window.partitionBy(grp).orderBy(col(bkt).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    scored.groupBy(grp, bkt).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy(grp)))
      .filter(col("cum") * denom >= col("n") * numer)
      .groupBy(grp).agg(max(bkt).as("b_threshold"))
  }
}
