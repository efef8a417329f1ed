package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hashed-feature linear quality classifier — the fastText-style
  * document filter standard in LLM curation stacks (Joulin et al.
  * 2017, "Bag of Tricks for Efficient Text Classification"; the
  * GPT-3/PaLM data recipes train exactly this shape against a
  * reference corpus vs raw crawl). A document's features are its
  * token unigrams and bigrams, hashed into a FIXED bucket space
  * (the hashing trick — the model size is the bucket count, never
  * the vocabulary); the model is one integer weight per bucket; the
  * score is the dot product of the document's feature-bucket counts
  * with that weight vector.
  *
  * Training is closed-form Naive-Bayes-style rather than SGD, so the
  * whole pipeline is deterministic and engine-replayable: the weight
  * of bucket b is the difference of its Laplace-smoothed occurrence
  * frequencies under the positive (reference) and negative (crawl /
  * boilerplate) training slices,
  *
  *   w_e9(b) = floor((n_pos(b)+1)·1e9 / (N_pos+B))
  *           − floor((n_neg(b)+1)·1e9 / (N_neg+B))
  *
  * (all BIGINT floor arithmetic at the same 1e9 scale as
  * [[LangModel.lmScoreFrom]]; NB with per-feature likelihoods IS a
  * linear classifier over counts, so this is the linear-model shape
  * with honestly-derived weights, not a stand-in). A document's
  * margin is Σ w_e9(bucket(f)) over its feature OCCURRENCES —
  * integer-exact, no division, so negative margins never touch a
  * floor-vs-truncate engine seam.
  *
  * Scale shape: the weight vector is BUCKET-sized (default 4096 —
  * a few KB) regardless of corpus size: training is one gram-keyed
  * aggregation over the (bounded) training slices, the vector then
  * BROADCASTS and scoring is a map-side join over the exploded
  * feature stream plus one doc-keyed partial-aggregated rollup —
  * the same two-shuffle shape as LM scoring, nothing corpus-keyed
  * beyond the doc_id rollup. At 100 TB the smoothed-frequency
  * numerators go through DECIMAL(28,0) (a single bucket count past
  * ~9.2e9 would overflow the BIGINT·1e9 intermediate — real for a
  * 4096-bucket space once the training slice passes ~10¹³ tokens).
  *
  * The feature hash is the repo's engine-portable signature: the
  * first 15 hex digits of md5 as a BIGINT, mod the bucket count —
  * DuckDB replays it digit by digit, so the gate hash-checks the
  * hashing trick itself, not just the arithmetic above it.
  */
object Classifier {

  /** Probability scale: frequencies ≈ f_e9 / 1e9 (matches LangModel). */
  val ScaleE9 = 1000000000L

  /** Default feature-hash bucket count (the model dimension). */
  val Buckets = 4096

  /** Feature stream: one row per token-unigram and token-bigram
    * OCCURRENCE (a bag, not a set — NB likelihoods and the margin
    * both weight by multiplicity). Bigrams join with a single space
    * over [[TextOps.tokens]], mirrored by the oracle's
    * `ts[i] || ' ' || ts[i+1]` transform. `carry` columns (labels)
    * ride along so train-slice predicates evaluated on the DOCUMENT
    * frame survive the explosion.
    */
  private def features(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val keep = (col("doc_id") +: carry.map(col)) :+ TextOps.tokens(col("text")).as("ts")
    val base = docs.select(keep: _*)
    val out = (col("doc_id") +: carry.map(col)) :+ col("f")
    val uni = base.withColumn("f", explode(col("ts"))).select(out: _*)
    // guard: sequence(1, size-1) runs BACKWARDS on a 1-token doc
    // (Spark generates descending sequences), so the bigram branch
    // filters first
    val bi = base.filter(size(col("ts")) >= 2)
      .withColumn("f",
        explode(transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat(element_at(col("ts"), i), lit(" "),
            element_at(col("ts"), i + 1)))))
      .select(out: _*)
    uni.unionAll(bi)
  }

  /** (doc_id, [carry...], b): each feature occurrence keyed by its
    * hash bucket.
    */
  private def bucketedFeatures(docs: DataFrame, buckets: Int,
      carry: Seq[String]): DataFrame =
    features(docs, carry).withColumn("b",
      conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long") % buckets)
      .drop("f")

  /** The trained weight vector: exactly `buckets` rows (b, w_e9),
    * every bucket defined — unseen buckets get the pure-smoothing
    * weight, so scoring needs no coalesce. Tiny by construction;
    * callers broadcast it. ONE aggregation over the feature stream
    * builds both class counts (the totals fold from the 4096-row
    * counts frame, not a second corpus pass).
    */
  def weightVector(bf: DataFrame, posPred: Column, negPred: Column,
      buckets: Int): DataFrame = {
    val spark = bf.sparkSession
    // the counts frame is bucket-sized but its LINEAGE is the full
    // feature pipeline, and two consumers read it (the bucket join
    // and the totals fold) — pin it so the corpus aggregation runs
    // once even when the caller's bf is itself unpinned (the
    // scoreAgainst shape, where the train side is the landed history)
    val counts = graft.Shared.materialize(
      bf.groupBy("b").agg(
        sum(when(posPred, 1L).otherwise(0L)).as("np"),
        sum(when(negPred, 1L).otherwise(0L)).as("nn")))
    val tot = counts.agg(sum("np").as("tp"), sum("nn").as("tn"))
    spark.range(buckets).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        // DECIMAL numerators for the same reason as LangModel: a
        // bucket count past ~9.2e9 overflows the BIGINT·1e9 product;
        // `div` floors back to BIGINT so values match wherever BIGINT
        // sufficed
        (expr(s"cast(coalesce(np, 0L) + 1L as decimal(28, 0)) * ${ScaleE9}L " +
          s"div (tp + $buckets)") -
         expr(s"cast(coalesce(nn, 0L) + 1L as decimal(28, 0)) * ${ScaleE9}L " +
          s"div (tn + $buckets)")).as("w_e9"))
  }

  /** Score every document of `docs` with a classifier trained on the
    * rows matching `posPred` (reference class) vs `negPred`
    * (rejection class) — predicates over `docs`' own columns (any
    * column: they are evaluated on the document frame BEFORE the
    * feature explosion and ride the stream as boolean labels), the
    * production shape being labeled slices of the same corpus frame.
    * Output: (doc_id, n_feat, margin_e9), margin_e9 = the integer
    * dot product (positive ⇒ reference-like).
    *
    * The bucketed feature stream feeds two consumers (the weight
    * aggregation and the scoring join) — pinned with
    * Shared.materialize so tokenize+hash runs ONCE, the
    * txLmThreshold contract (Verify/Bench release after the action).
    */
  def scoreFrom(docs: DataFrame, posPred: Column, negPred: Column,
      buckets: Int = Buckets): DataFrame = {
    val labeled = docs.withColumn("_pos", posPred).withColumn("_neg", negPred)
    val bf = graft.Shared.materialize(
      bucketedFeatures(labeled, buckets, Seq("_pos", "_neg")))
    val w = weightVector(bf, col("_pos"), col("_neg"), buckets)
    bf.join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"), sum("w_e9").as("margin_e9"))
      .orderBy("doc_id")
  }

  /** The at-ingest twin — score an arriving `batch` against weights
    * trained on the already-landed `train` corpus's labeled slices:
    * the production shape (a filter retrains on a schedule, not per
    * batch, and every batch between retrains scores under the SAME
    * broadcast weight vector, so verdicts are stable and auditable
    * against a pinned model version). Weight building reads only the
    * train side; the batch pays one feature projection + the
    * broadcast join + its own doc rollup.
    */
  def scoreAgainst(train: DataFrame, batch: DataFrame,
      posPred: Column, negPred: Column, buckets: Int = Buckets): DataFrame =
    scoreWith(batch, pinnedWeights(train, posPred, negPred, buckets), buckets)
      .orderBy("doc_id")

  /** The pinned model artifact: the weight vector trained once on
    * `train`'s labeled slices, as a standalone `buckets`-row frame a
    * deployment LANDS (parquet/table) and every scoring site between
    * retrains reads — the model-versioning half of [[scoreAgainst]]
    * split out so a STREAMING screen can train once outside the query
    * and score every micro-batch under the same artifact.
    */
  def pinnedWeights(train: DataFrame, posPred: Column, negPred: Column,
      buckets: Int = Buckets): DataFrame = {
    val labeled = train.withColumn("_pos", posPred).withColumn("_neg", negPred)
    weightVector(bucketedFeatures(labeled, buckets, Seq("_pos", "_neg")),
      col("_pos"), col("_neg"), buckets)
  }

  /** Score `docs` under an already-built weight vector (the landed
    * model artifact): one feature projection, the broadcast bucket
    * join, one doc-keyed rollup — the per-batch cost of the at-ingest
    * screen, nothing corpus- or history-sized.
    */
  def scoreWith(docs: DataFrame, weights: DataFrame,
      buckets: Int = Buckets): DataFrame =
    bucketedFeatures(docs, buckets, Nil)
      .join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"), sum("w_e9").as("margin_e9"))

  /** Driver-gate surface for [[scoreAgainst]]: history = docs < 250
    * (its % 10 slices as the labels), batch = docs ≥ 250.
    */
  def scoreIncr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    scoreAgainst(docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250),
      col("doc_id") % 10 === 0, col("doc_id") % 10 === 5)
  }

  /** Driver-gate surface: train on the deterministic id slices
    * (doc_id % 10 == 0 as the reference class, % 10 == 5 as the
    * rejection class — the synthetic corpus has no labeled split, so
    * the gate pins the ARITHMETIC: hashing trick, smoothed-frequency
    * weights, integer dot product; TrainingSpec holds the semantic
    * separation claim on a labeled fixture).
    *
    * posPred/negPred reference doc_id, which [[bucketedFeatures]]
    * carries through — so the slice filters run on the feature
    * stream, once, instead of scanning documents twice.
    */
  def score(spark: SparkSession, dir: String): DataFrame =
    scoreFrom(Tables.documents(spark, dir),
      col("doc_id") % 10 === 0, col("doc_id") % 10 === 5)

  /** The offset-guarded milli-scale margin bucket (ONE copy, shared
    * by [[thresholdCut]] and the full-pipeline composition). Margins
    * are signed, and Spark's `div` truncates toward zero where
    * DuckDB's `//` floors — bucketing adds a 1e15 offset (a multiple
    * of the 1e6 bucket width, so the election is shift-invariant) to
    * keep every numerator positive, where the two semantics agree.
    * The offset covers |margin_e9| < 1e15, i.e. n_feat < ~1e6 (each
    * feature weight is bounded by ±1e9): a ~500k-token doc could
    * exceed it and silently re-open the truncate-vs-floor seam, so
    * out-of-range margins FAIL LOUDLY (assert_true in the bucketing
    * expression) instead of producing cross-engine drift.
    */
  val MarginBucketSql: String =
    "(margin_e9 + CASE WHEN margin_e9 > -1000000000000000L " +
      "AND margin_e9 < 1000000000000000L THEN 1000000000000000L " +
      "ELSE assert_true(false, 'classifier margin outside +-1e15: " +
      "offset bucketing seam re-opened — derive a larger offset') " +
      "END) div 1000000"

  /** Classifier keep-cut: the tx_lm_threshold histogram election over
    * classifier margins — keep the most reference-like ~70 % per
    * language, rank-exact at MILLI-scale margin buckets (bucketing
    * via [[MarginBucketSql]], whose range guard fails loudly instead
    * of letting an out-of-range margin drift across engines).
    */
  def thresholdCut(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.Shared.materialize(
      score(spark, dir).select("doc_id", "margin_e9")
        .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
        .withColumn("mbkt", expr(MarginBucketSql)))
    val th = Elections.histogramThreshold(scored, "lang", "mbkt")
    scored.join(broadcast(th), Seq("lang"))
      .filter(col("mbkt") >= col("b_threshold"))
      .select(col("doc_id"), col("lang"), col("margin_e9"), col("b_threshold"))
      .orderBy("doc_id")
  }
}
