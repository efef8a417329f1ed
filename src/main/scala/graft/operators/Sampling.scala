package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: each stratum keeps a configured
  * fraction of its rows, decided by comparing a salted md5 of the row
  * id against a per-stratum hex threshold (the same engine-portable
  * trick as the train/val/test split — md5 hex prefixes order
  * identically in any engine, so the sample is reproducible across
  * engines, partition counts, and reruns, unlike `TABLESAMPLE`/rand()).
  *
  * Thresholds are 2-hex-digit prefixes: "cc" keeps ≈ 0xcc/0x100 = 80%,
  * "80" ≈ 50%, "33" ≈ 20%. The threshold table broadcasts (strata are
  * dimension-sized by definition); the fact side is a narrow
  * filter — no shuffle at any scale.
  */
object Sampling {

  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      thresholds: Map[String, String], defaultThreshold: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = thresholds.toSeq.toDF(stratumCol, "_cut")
    val h = md5(concat(lit("strat|"), col(idCol)))
    df.join(broadcast(dim), Seq(stratumCol), "left")
      .where(h < coalesce(col("_cut"), lit(defaultThreshold)))
      .drop("_cut")
  }

  /** Deterministic global shuffle + sharding — the pipeline-FINAL
    * stage: training wants the curated corpus in a data order
    * decorrelated from ingest order (crawl locality in the stream
    * order measurably hurts convergence), split across N output
    * shards. Both decisions ride one salted md5: the shard is the
    * hash's residue mod N (uniform, seed-switchable via the salt),
    * the WITHIN-shard position is the rank of the full hash — so the
    * permutation is reproducible across engines, partition counts
    * and reruns (the rand()/repartition idiom is none of those), and
    * re-keying the salt is a fresh epoch-level reshuffle.
    *
    * Scale shape: one hash projection on the scan, one shuffle on
    * the shard key, one per-shard rank — each shard sorts corpus/N
    * rows, the terasort shape, which is the honest minimum for a
    * deterministic total order within shards. Nothing global: no
    * corpus-wide sort, no driver state. Collisions cannot corrupt
    * determinism: the id breaks hash ties.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(nShards >= 1, s"shardShuffle: nShards must be >= 1, got $nShards")
    val h = md5(concat(lit(s"$salt|"), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 15), 16, 10).cast("long") % nShards)
          .cast("bigint"))
      .withColumn("shard_pos", row_number().over(w).cast("bigint") - 1)
      .drop("_h")
  }
}
