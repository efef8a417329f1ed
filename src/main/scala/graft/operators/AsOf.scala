package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row matched with the single right row that is
  * latest-not-after its timestamp (event ↔ latest config at event
  * time — SURVEY §2.4's declared engine surface; the reference's
  * patched-config semantics reads "the config in force when the record
  * happened").
  *
  * Realized by composing built-ins (preference order (a) of the build
  * rules): equi-join on the key, range filter, then first-wins via
  * ROW_NUMBER over (key, left timestamp). The shuffle key is the join
  * key; at scale this is one shuffle plus a per-key sort — the same
  * cost envelope as a sort-merge join. For heavily duplicated right
  * sides, pre-aggregate the right table to its per-(key, ts) latest
  * row first.
  */
object AsOf {

  /** leftKey/rightKey: equality keys; leftTs/rightTs: event time.
    * Every left row survives (left outer as-of); unmatched rows carry
    * nulls.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      leftUnique: String, rightTieBreak: Seq[String] = Nil): DataFrame = {
    val matched = left.join(right,
        col(leftKey) === col(rightKey) && col(rightTs) <= col(leftTs), "left")
    val ordering = col(rightTs).desc_nulls_last +:
      rightTieBreak.map(c => col(c).desc_nulls_last)
    val w = Window.partitionBy(col(leftUnique)).orderBy(ordering: _*)
    matched
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
