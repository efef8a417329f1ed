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
}
