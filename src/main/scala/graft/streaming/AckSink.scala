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
  * failure (at-least-once), so both the data write and the ledger
  * append are keyed by batchId and skipped when already present —
  * replays become no-ops instead of duplicates.
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
        if (!Files.exists(Paths.get(dataPath))) { // idempotent replay guard
          val withBytes = batch.withColumn("_nbytes", length(col(bytesOf)).cast("long"))
          withBytes.write.mode(SaveMode.Overwrite).parquet(dataPath)
          val spark = batch.sparkSession
          import spark.implicits._
          val stats = withBytes.agg(count(lit(1)), coalesce(sum(col("_nbytes")), lit(0L)))
            .as[(Long, Long)].head()
          Seq((batchId, stats._1, stats._2)).toDF("batch_id", "rows", "bytes")
            .write.mode(SaveMode.Overwrite).parquet(s"$ledgerDir/batch=$batchId")
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
