package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.Dedup

/** Streaming dedup-at-ingest: new documents arriving as files are
  * screened for near-duplicates against the landed signature catalog
  * per micro-batch, using the SAME operator the batch path runs
  * ([[Dedup.minhashLshIncremental]]) — and because that screen is
  * catalog-only (each verdict depends on one document's shingles and
  * the static catalog, never on batch-mates), the union of per-batch
  * verdicts equals the batch verdict REGARDLESS of how the stream is
  * micro-batched. StreamingSpec asserts that equality file-by-file.
  *
  * Exactly-once: checkpointed file source + an IDEMPOTENT sink —
  * each micro-batch overwrites its own `batch_id=<n>` partition, so
  * a batch replayed after a crash-before-offset-commit rewrites the
  * same rows instead of appending duplicates (the same batchId-keyed
  * idempotence discipline as [[graft.streaming]]'s AckSink; a blind
  * append would only be at-least-once). The catalog is recomputed
  * from `histDocs` per batch here; a production run points this at a
  * LANDED signature/bands table (bucketed by band key via
  * `plans.BucketedLayout`) and appends accepted docs' signatures
  * downstream, so per-batch cost scales with the batch, not history.
  */
object DocScreen {

  /** Screen `srcDir`'s document files against `histDocs` (a static
    * (doc_id, text, …) frame); flagged rows land in `sinkDir`,
    * partitioned by micro-batch id. Read the verdicts with
    * `spark.read.parquet(sinkDir)` (the `batch_id` partition column
    * rides along).
    */
  def incrementalNeardupScreen(spark: SparkSession, srcDir: String,
      schema: StructType, histDocs: DataFrame,
      sinkDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val histSh = Dedup.shinglesOf(histDocs, "doc")
    val screen: (DataFrame, Long) => Unit = { (batch, batchId) =>
      Dedup.minhashLshIncremental(Dedup.shinglesOf(batch, "doc"), histSh)
        .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      // drop the subtrees the screen pinned for this batch: the batch
      // side registers under foreachBatch's CLONED session, the
      // history side under the original session — release both
      graft.Shared.releaseAll(batch.sparkSession)
      graft.Shared.releaseAll(spark)
    }
    val q = EventStream.fromDirectory(spark, srcDir, schema, maxFilesPerTrigger)
      .writeStream
      .foreachBatch(screen)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
