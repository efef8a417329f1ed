package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Temperature-based domain mixing — the multilingual-training
  * sampling discipline (exponentiated-smoothing over domain counts,
  * the α = 0.5 rule popularized by multilingual BERT / XLM-R): a raw
  * corpus is dominated by its largest domains, so the training mix
  * draws domain d with probability ∝ n_d^α, boosting the tail and
  * squashing the head, then samples WITHIN each domain uniformly.
  *
  * Everything is integer-exact so the driver gate replays it in SQL:
  *  - per-domain weight u_d = floor(sqrt(n_d)·1000) (α = 0.5; sqrt
  *    and floor are value-exact IEEE ops in every engine),
  *  - global target N = n_total·num/den docs (floor),
  *  - per-domain quota t_d = u_d·N/ΣU (floor),
  *  - keep probability t_d/n_d expressed as a 24-bit hex cut
  *    hcut = min(16^6 − 1, t_d·16^6/n_d): a doc survives iff the
  *    first 6 hex chars of md5("mix|" ++ doc_id) compare below the
  *    cut (the tx_stratified_sample discipline — deterministic,
  *    retry/speculation-safe, no rand()). The min caps oversampled
  *    tail domains at keep-all (less 2^-24, the price of the lexical
  *    compare staying 6-vs-6 chars).
  *
  * Scale shape: one domain-keyed count aggregation (domain-sized
  * output), the weight/quota algebra on that tiny frame (window-free:
  * totals come from a broadcast 1-row aggregate), then one broadcast
  * join back onto the corpus scan and a codegen'd md5 filter — no
  * corpus-sized shuffle anywhere. BIGINT products stay exact up to
  * ~10^9-doc corpora (u_d·N < 2^63); past that, drop the ·1000 weight
  * scale a digit.
  */
object Mixer {

  /** Hex-cut denominator: 16^6 (6 hex chars = 24 bits). */
  val HexSpace = 16777216L

  /** Temperature mix over the `documents` table, domain = `lang`,
    * target size = half the corpus.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMixFrom(Tables.documents(spark, dir), col("lang"))

  /** [[temperatureMix]] over any frame with a `doc_id` and a domain
    * column; target size = n_total · targetNum / targetDen.
    */
  def temperatureMixFrom(docs: DataFrame, domain: org.apache.spark.sql.Column,
      targetNum: Long = 1, targetDen: Long = 2): DataFrame = {
    require(targetNum >= 0 && targetDen > 0 && targetNum <= targetDen,
      s"temperatureMix: target fraction $targetNum/$targetDen outside [0, 1]")
    val n = docs.groupBy(domain.as("dom")).agg(count(lit(1)).as("nd"))
    val u = n.select(col("dom"), col("nd"),
      floor(sqrt(col("nd")) * 1000).cast("long").as("ud"))
    val tot = u.agg(sum("nd").as("ntot"), sum("ud").as("usum"))
    val cuts = u.crossJoin(broadcast(tot))
      .select(col("dom"), col("nd"),
        expr(s"ud * (ntot * $targetNum div $targetDen) div usum").as("td"))
      .select(col("dom"), col("nd"),
        least(lit(HexSpace - 1), expr(s"td * $HexSpace div nd")).as("hcut"))
      .select(col("dom"), col("nd").as("n_dom"),
        lower(lpad(hex(col("hcut")), 6, "0")).as("hcut6"))
    docs.join(broadcast(cuts), domain === col("dom"))
      .filter(substring(md5(concat(lit("mix|"), col("doc_id"))), 1, 6) < col("hcut6"))
      .drop("dom")
  }
}
