package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.plans.GramCatalog

/** Streaming substring-dedup-at-ingest: each micro-batch of documents
  * is span-screened against the landed gram-stats catalog
  * ([[GramCatalog]]) bounded to ingest partitions ≤ batchId, the
  * spans land in the sink partitioned by batch id, and the batch's
  * OWN gram stats append as partition batchId + 1 — so the next batch
  * sees this one as history. Every batch appends (substring dedup
  * keeps documents and cuts spans later, unlike DocScreen's
  * drop-the-duplicate screen, so there is no accepted/rejected split
  * to gate the append on).
  *
  * Parity contract (pinned in StreamingSpec): the gram screen's
  * verdicts are inherently ORDER-dependent — a duplicated run flags
  * in the LATER copy — so stream == the sequential per-batch loop
  * (`dupSpansIncrementalFrom` with accumulating stats) over the same
  * files in the same order, which is the incremental contract. The
  * whole-corpus backfill ([[graft.operators.Dedup.dupSpans]]) is a
  * different operator answering a different question.
  *
  * Exactly-once: checkpointed file source; the verdict write
  * overwrites its own `batch_id=<n>` partition and the stats append
  * is a dynamic partition overwrite of partition batchId + 1, with
  * the screen bounded to ≤ batchId — a batch replayed after a
  * crash-after-append rewrites identical state and can never see its
  * own grams as history.
  */
object GramScreen {

  def spanScreen(spark: SparkSession, srcDir: String, schema: StructType,
      cat: GramCatalog.Handle, sinkDir: String, checkpointDir: String,
      minDocs: Int = 2, maxFilesPerTrigger: Int = 1): Unit = {
    val screen: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val s = batch.sparkSession
      val spans = GramCatalog.screen(s, batch, cat, minDocs,
        maxIngestId = Some(batchId)).localCheckpoint(true)
      spans.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      GramCatalog.append(s, batch, cat, batchId + 1)
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
}
