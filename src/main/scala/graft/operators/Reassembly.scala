package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked-transfer reassembly with at-least-once delivery semantics
  * (`server/beacon.c:553-588` chunk/ACK loop, `honeycomb.py:413-445`
  * reassembly): chunks keyed by (stream_id, offset) may arrive
  * duplicated and out of order; reassembly must be idempotent and
  * order-insensitive.
  *
  * Spark realization: dedup on the natural key, then an order-stable
  * in-group sort + binary concat (the DQ20 pattern applied to bytes).
  * One shuffle on stream_id; no driver-side loops.
  */
object Reassembly {

  /** chunks(stream_id STRING, offset BIGINT, data BINARY) →
    * (stream_id, blob BINARY, n_chunks, total_bytes, contiguous BOOL).
    * `contiguous` verifies resume accounting: every chunk must start
    * exactly where the previous ended — the ACK bookkeeping invariant.
    */
  def reassemble(chunks: DataFrame): DataFrame = {
    val deduped = chunks
      .groupBy(col("stream_id"), col("offset"))
      .agg(first(col("data")).as("data")) // duplicates are identical retransmits
    deduped
      .groupBy("stream_id")
      .agg(
        array_sort(collect_list(struct(col("offset"), col("data")))).as("parts"),
        count(lit(1)).as("n_chunks"))
      .select(
        col("stream_id"),
        expr("aggregate(parts, CAST(concat() AS BINARY), (acc, p) -> concat(acc, p.data))").as("blob"),
        col("n_chunks"),
        expr("aggregate(parts, 0L, (acc, p) -> acc + length(p.data))").as("total_bytes"),
        expr(
          """aggregate(parts, named_struct('pos', 0L, 'ok', true),
            |  (acc, p) -> named_struct(
            |    'pos', p.offset + length(p.data),
            |    'ok', acc.ok AND p.offset = acc.pos),
            |  acc -> acc.ok)""".stripMargin).as("contiguous"))
  }

  /** Split a blob into fixed-size chunks (the sender side; chunk size
    * is the transport's 4052-byte MAX_SSL_PACKET_SIZE by default).
    */
  def chunk(blobs: DataFrame, chunkSize: Int = 4052): DataFrame =
    blobs
      .select(col("stream_id"), col("blob"),
        explode(expr(s"sequence(0L, CAST(floor((length(blob) - 1) / $chunkSize) AS BIGINT))")).as("ci"))
      .select(col("stream_id"), (col("ci") * chunkSize).as("offset"),
        expr(s"substring(blob, CAST(ci * $chunkSize + 1 AS INT), $chunkSize)").as("data"))

  /** Convenience for specs and gates: synthetic chunk stream with
    * every `everyNth`-th chunk duplicated deterministically (the
    * at-least-once retransmit). `chunkSize` must match the stride the
    * chunks were cut at.
    */
  def withRetransmits(chunks: DataFrame, chunkSize: Int = 4052,
      everyNth: Int = 3): DataFrame =
    chunks.union(chunks.filter(
      pmod(col("offset"), lit(everyNth.toLong * chunkSize)) === 0))
}
