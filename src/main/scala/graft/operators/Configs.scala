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

  /** Append-only audit ledger — [[upsert]]'s twin for the patcher's
    * key log (`client/patcher.c:231-302`: every accepted patch run
    * APPENDS a record to ID-keys.txt; nothing is ever rewritten).
    * Union of history and new additions, with per-key append order
    * made explicit: `seq` = 1-based position in the key's chain
    * (ordered by `ordCol` then `tieCol`), `is_current` flags the
    * chain head. Where upsert keeps only the winner, the ledger
    * keeps every record AND the lineage. One shuffle on the key —
    * both window frames share the single partitioning.
    */
  def ledger(history: DataFrame, additions: DataFrame,
      keyCol: String, ordCol: String, tieCol: String): DataFrame = {
    val all = history.unionByName(additions)
    val wOrd = Window.partitionBy(keyCol).orderBy(col(ordCol), col(tieCol))
    val wAll = Window.partitionBy(keyCol)
    all.withColumn("seq", row_number().over(wOrd))
      .withColumn("is_current", col("seq") === count(lit(1)).over(wAll))
  }
}
