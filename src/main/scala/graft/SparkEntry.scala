package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{IngestPack, RelationalPack, TrainingPack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY §2) to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries
  * the value-equivalent DuckDB SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query (DQ13 revenue-by-nation) on sf0.001; driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalPack.dq13(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalPack.queries ++ TrainingPack.queries ++ IngestPack.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalPack.oracle ++ TrainingPack.oracle ++ IngestPack.oracle
}
