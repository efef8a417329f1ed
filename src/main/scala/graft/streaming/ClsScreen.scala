package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.Classifier

/** Streaming quality-classifier screen — the at-ingest filter every
  * production curation stack runs between crawls and the training
  * store: a fastText-shape model is trained ON A SCHEDULE (here:
  * once, on the landed history) and PINNED as a model artifact;
  * every arriving micro-batch then scores under that same artifact
  * and only reference-like documents (margin ≥ the cut) survive into
  * the corpus. Verdicts are stable and auditable against a model
  * version — a batch never sees weights that moved under it.
  *
  * Because the weights are pinned, a document's verdict depends only
  * on its own features and the artifact — never on batch-mates or
  * arrival order — so the union of per-batch verdicts equals the
  * batch verdict REGARDLESS of micro-batching (the [[DocScreen]]
  * catalog-only property, here by construction). StreamingSpec pins
  * that equality; the driver oracle replays the whole screen in SQL.
  *
  * Per-batch cost: one feature projection over the batch, a
  * broadcast join against the 4096-row weight artifact, one
  * doc-keyed rollup — nothing history-sized touches the hot loop
  * (training ran once, before the stream started).
  *
  * Exactly-once: checkpointed file source + idempotent sink — each
  * micro-batch overwrites its own `batch_id=<n>` partition, so a
  * replayed batch rewrites identical rows (the AckSink discipline).
  */
object ClsScreen {

  /** Screen `srcDir`'s arriving documents under the weight artifact
    * at `modelDir` (a parquet (b, w_e9) table, e.g. landed from
    * [[Classifier.pinnedWeights]]); survivors (margin_e9 ≥ minMargin)
    * land in `sinkDir` partitioned by micro-batch id.
    */
  def classifierScreen(spark: SparkSession, srcDir: String,
      schema: StructType, modelDir: String, sinkDir: String,
      checkpointDir: String, minMargin: Long = 0L,
      buckets: Int = Classifier.Buckets,
      maxFilesPerTrigger: Int = 1): Unit = {
    val screen: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val s = batch.sparkSession
      // the artifact read is per-batch by design: a deployment swaps
      // the model by replacing the directory between retrains, and
      // 4096 rows re-read per trigger costs nothing
      val w = s.read.parquet(modelDir)
      Classifier.scoreWith(batch, w, buckets)
        .filter(col("margin_e9") >= minMargin)
        .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      graft.Shared.releaseAll(s)
    }
    val q = EventStream.fromDirectory(spark, srcDir, schema, maxFilesPerTrigger)
      .writeStream
      .foreachBatch(screen)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Driver-gate REPLAY of the streaming classifier screen
    * (tx_stream_classifier): docs < 250 are the landed history whose
    * % 10 slices train the pinned weights ([[Classifier.scoreIncr]]'s
    * labels); docs ≥ 250 land once per (scale dir, content
    * fingerprint) as two mtime-ordered parquet slices ([250, 375)
    * then ≥ 375) and stream through [[classifierScreen]] one file per
    * micro-batch. The oracle replays the identical model + keep rule
    * in SQL (weights bounded to the history slice, batch filtered at
    * margin ≥ 0), so the ENGINE side genuinely executes Structured
    * Streaming under a landed model artifact while every surviving
    * margin is value-checked.
    */
  def screenReplayGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val hist = docs.filter(col("doc_id") < 250)
    // the pinned artifact lands next to the slices inside the same
    // _SLICED-guarded block, keyed by the same content fingerprint: a
    // testdata regen re-trains it
    val srcDir = ReplayGate.slicedSource(spark, dir, "graft_cls_src",
      docs.filter(col("doc_id") >= 250), "doc_id",
      alsoLand = sd => Classifier.pinnedWeights(hist,
        col("doc_id") % 10 === 0, col("doc_id") % 10 === 5)
        .write.mode("overwrite").parquet(s"$sd/_model"))
    val base = ReplayGate.gateBase(spark, dir, "graft_cls_gate")
    classifierScreen(spark, srcDir, docs.schema, s"$srcDir/_model",
      s"$base/sink", s"$base/ck")
    spark.read.parquet(s"$base/sink")
      .select(col("doc_id"), col("n_feat"), col("margin_e9"))
      .orderBy("doc_id")
  }
}
