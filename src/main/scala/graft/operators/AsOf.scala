package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: each left row matched with the single right row that is
  * latest-not-after its timestamp (event ↔ latest config at event
  * time — SURVEY §2.4's declared engine surface; the reference's
  * patched-config semantics reads "the config in force when the record
  * happened").
  *
  * Realized as a union-merge, not a range join: both streams are
  * tagged and unioned, shuffled ONCE on the equality key, sorted by
  * (ts, tag, tie-break) within each key, and every left row reads the
  * last right row seen so far (`last(_, ignoreNulls)` over the
  * running window). Cost is linear in |left| + |right| per key — one
  * shuffle plus a per-key sort, the same envelope as a sort-merge
  * join. The naive alternative (left range-join then ROW_NUMBER()=1)
  * first materializes every (event, earlier-config) pair, which is
  * |events/key| x |configs/key| — quadratic on hot keys and a
  * non-starter at 100 TB.
  */
object AsOf {

  /** leftKey/rightKey: equality keys; leftTs/rightTs: event time.
    * Every left row survives (left outer as-of); unmatched rows carry
    * nulls. Ties on rightTs resolve to the greatest rightTieBreak,
    * matching `ORDER BY rightTs DESC, tieBreak DESC ... ROW_NUMBER()=1`.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    // merge on the WIDER common timestamp type: casting right to the
    // left type would truncate (right TIMESTAMP vs left DATE makes a
    // later-in-the-day config visible), silently changing the
    // rightTs <= leftTs contract. A date paired with either timestamp
    // flavor widens to that timestamp type; TIMESTAMP vs TIMESTAMP_NTZ
    // (equal microsecond precision, no truncation either way) keeps
    // the left type. Anything else is a caller error at plan time.
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val tsType = (left.schema(leftTs).dataType, right.schema(rightTs).dataType) match {
      case (a, b) if a == b => a
      case (DateType, t @ (TimestampType | TimestampNTZType)) => t
      case (t @ (TimestampType | TimestampNTZType), DateType) => t
      case (a @ (TimestampType | TimestampNTZType), TimestampType | TimestampNTZType) => a
      case (a, b) => throw new IllegalArgumentException(
        s"as-of timestamp types must match or widen date->timestamp, got $a vs $b")
    }
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val tbType = StructType(rightTieBreak.map(c => right.schema(c)))
    // degenerate no-tie-break case: a constant keeps the sort key shape
    val tbOf: Column = if (rightTieBreak.isEmpty) lit(0)
      else struct(rightTieBreak.map(col): _*).cast(tbType)
    val tbNull: Column = if (rightTieBreak.isEmpty) lit(0)
      else lit(null).cast(tbType)
    // right rows with a null key or null ts can never match under the
    // reference comparison semantics (NULL <= ts is not true) — drop
    // them before the merge instead of letting them pollute a key group
    val rightRows = right
      .where(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"),
        col(rightTs).cast(tsType).as("_ts"),
        lit(0).as("_tag"),
        tbOf.as("_tb"),
        lit(null).cast(lType).as("_lv"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("_rv"))
    val leftRows = left.select(
      col(leftKey).as("_k"),
      col(leftTs).cast(tsType).as("_ts"),
      lit(1).as("_tag"),
      tbNull.as("_tb"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_lv"),
      lit(null).cast(rType).as("_rv"))
    // ascending merge order: at equal ts a right row sorts before a
    // left row (tag 0 < 1), so a config stamped exactly at event time
    // is visible (rightTs <= leftTs); among right rows at the same ts
    // the greatest tie-break sorts last and therefore wins last()
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_tag").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightRows.unionByName(leftRows)
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select(col("_lv.*"), col("_match.*"))
  }
}
