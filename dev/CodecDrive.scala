// Dev-only surface drive: exercises the codec pack through the public
// API (register + spark.sql) over real test data. Run via:
//   cp dev/CodecDrive.scala src/main/scala/graft/ && sbt "runMain graft.CodecDrive" && rm src/main/scala/graft/CodecDrive.scala
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{CodecExpressions => CE}

object CodecDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CE.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("documents")
    // crc16 + round-trip codecs over the real documents table, via SQL
    spark.sql(
      """SELECT doc_id,
        |       crc16_ccitt(CAST(text AS BINARY)) AS crc,
        |       size_decode(size_encode(n_chars)) AS sz_rt,
        |       n_chars
        |FROM documents WHERE doc_id < 5 ORDER BY doc_id""".stripMargin).show()
    // TLV: encode a beacon-shaped payload per row, decode, explode
    val out = spark.sql(
      """SELECT doc_id, f.type AS t, CAST(f.value AS STRING) AS v
        |FROM (SELECT doc_id,
        |        tlv_decode(tlv_encode(array(
        |          struct(1 AS type, CAST(lang AS BINARY) AS value),
        |          struct(7 AS type, CAST(source AS BINARY) AS value)))) AS fs
        |      FROM documents WHERE doc_id < 3)
        |LATERAL VIEW explode(fs) AS f
        |ORDER BY doc_id, t""".stripMargin)
    out.show(truncate = false)
    val n = out.count()
    println(s"TLV exploded rows: $n (expect 6)")
    assert(n == 6)
    println("CODEC DRIVE OK")
    spark.stop()
  }
}
