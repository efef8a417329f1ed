package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Chunk-transfer sink with ACK bookkeeping (`server/beacon.c:553-588`
  * chunk/ACK loop as a sink contract): each micro-batch lands its
  * records and appends one ledger row (batch id, rows, bytes) — the
  * receiver-side "bytes_sent += recv_sz" accounting.
  *
  * Exactly-once by idempotence: foreachBatch may replay a batch after
  * failure (at-least-once). The replay guard keys on the LAST artifact
  * of the batch — the ledger's `_SUCCESS` marker — not the first: data
  * lands before the ledger, so guarding on the data path would turn a
  * crash between the two writes into a permanently missing ledger row.
  * A replay of an incompletely committed batch rewrites the data
  * (Overwrite → idempotent) and then the ledger; a replay of a fully
  * committed batch is a no-op.
  */
object AckSink {

  /** Start + drain a stream into `dataDir`, ledger at `ledgerDir`.
    * `bytesOf` names the column whose byte length feeds the ledger.
    */
  def run(stream: DataFrame, dataDir: String, ledgerDir: String,
      checkpointDir: String, bytesOf: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dataPath = s"$dataDir/batch=$batchId"
        val ledgerPath = s"$ledgerDir/batch=$batchId"
        // Replay guard on the ledger's _SUCCESS marker — the final,
        // atomically-committed artifact. Anything short of it means the
        // batch never fully committed; redo both writes (Overwrite).
        if (!Files.exists(Paths.get(ledgerPath, "_SUCCESS"))) {
          val withBytes = batch.withColumn("_nbytes", length(col(bytesOf)).cast("long"))
          withBytes.write.mode(SaveMode.Overwrite).parquet(dataPath)
          val spark = batch.sparkSession
          import spark.implicits._
          val stats = withBytes.agg(count(lit(1)), coalesce(sum(col("_nbytes")), lit(0L)))
            .as[(Long, Long)].head()
          Seq((batchId, stats._1, stats._2)).toDF("batch_id", "rows", "bytes")
            .write.mode(SaveMode.Overwrite).parquet(ledgerPath)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
