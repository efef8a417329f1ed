package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based conditional projection: emit a value once per group,
  * on the group's first row in emission order.
  *
  * Models the reference's header-once survey formatting
  * (`server/process_list.c:110` `if (showHeader == 1) showHeader = 0;`
  * and `:208-218`, where only the first /proc entry is rendered with
  * the column-header prefix) as a declarative operator: ROW_NUMBER
  * over (group, order) gates the projection, so the whole thing is
  * one shuffle on the group key — no stateful scan order required.
  */
object Emission {

  /** `out` = header-prefixed `body` on each group's first row (by
    * `order`), bare `body` elsewhere. Header and body are arbitrary
    * Column expressions, so any formatted survey block works.
    */
  def headerOnce(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], header: Column, body: Column,
      out: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn(out,
        when(col("_rn") === 1, concat(header, lit("\n"), body)).otherwise(body))
      .drop("_rn")
  }
}
