package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-record upsert (SURVEY §2.1's binary config patcher,
  * `client/patcher.c:53-109`, modeled as data): the patcher locates a
  * record by its signature key and overwrites its fields; as an engine
  * operator that is "latest version wins per key" over a base table
  * plus an update stream.
  *
  * One shuffle on the key; ties broken deterministically by the
  * version column then source priority (updates beat base at equal
  * version — the patcher's overwrite semantics).
  */
object Configs {

  /** base/updates must share schema: (key, version, payload...).
    * Returns one row per key: the highest-version record, updates
    * winning ties.
    */
  def upsert(base: DataFrame, updates: DataFrame,
      keyCol: String, versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }
}
