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
    * Scale shape — TWO-PHASE DISTRIBUTED RANK (the terasort offset
    * trick): a naive per-shard window would sort corpus/nShards rows
    * in ONE task per shard (12.5 TB/task at 100 TB with 8 shards), so
    * the rank is instead computed per (shard, hash-range) — the range
    * is the hash's first two hex digits, 256 sub-partitions per shard
    * — and offset by the count of the shard's EARLIER ranges. The
    * counts frame is ≤ 256·nShards rows (one cheap partial-aggregated
    * pass) and broadcasts; the data then shuffles ONCE on
    * (shard, range) for the local sort, so parallelism is
    * 256 × nShards regardless of how few shards the caller asks for.
    * Range-prefix ordering composes with the full-hash order because
    * the range IS the hash's leading digits (ties broken by id, which
    * lives entirely inside one range). Nothing global: no corpus-wide
    * sort, no driver state, output values identical to the
    * single-window semantics the oracle replays.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(nShards >= 1, s"shardShuffle: nShards must be >= 1, got $nShards")
    val h = md5(concat(lit(s"$salt|"), col(idCol)))
    val keyed = df.withColumn("_h", h)
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 15), 16, 10).cast("long") % nShards)
          .cast("bigint"))
      .withColumn("_rng", substring(col("_h"), 1, 2))
    // phase 1: per-(shard, range) row counts -> each range's starting
    // offset within its shard. The md5 projection re-runs on this
    // branch (map-only, cheaper than materializing the corpus), and
    // the shuffle carries only partial-aggregated count rows.
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("_rng")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("shard", "_rng").agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum("_c").over(wOff), lit(0L)))
      .drop("_c")
    // phase 2: local rank inside each (shard, range) + the broadcast
    // offset = the exact per-shard rank of (hash, id)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "_rng").orderBy(col("_h"), col(idCol))
    keyed.join(broadcast(offsets), Seq("shard", "_rng"))
      .withColumn("shard_pos",
        (col("_off") + row_number().over(wRank) - 1).cast("bigint"))
      .drop("_h", "_rng", "_off")
  }
}
