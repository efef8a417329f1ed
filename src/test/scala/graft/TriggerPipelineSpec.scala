package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TriggerPipeline

/** Trigger gate chain: tampered packets die at the CRC gate, unknown
  * keys at the semi-join, everything else decodes to the planted
  * fields.
  */
class TriggerPipelineSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gate chain: verdicts partition the corpus along the planted channels") {
    import spark.implicits._
    val out = TriggerPipeline.run(spark, dir)
      .select("trigger_id", "verdict").as[(Long, String)].collect().toMap
    val events = Tables.events(spark, dir)
      .select("event_id", "user_id").as[(Long, Long)].collect()
    assert(out.size === events.length)
    events.foreach { case (eid, uid) =>
      val expected =
        if (eid % 7 == 6) "bad_crc"              // tampered
        else if ((uid % 7) % 2 == 1) "unknown_key" // odd key not accepted
        else "accepted"
      assert(out(eid) === expected, s"trigger $eid (user $uid)")
    }
  }

  test("accepted triggers decode to the planted callback fields") {
    import spark.implicits._
    val out = TriggerPipeline.run(spark, dir)
      .filter(col("verdict") === "accepted")
      .select("trigger_id", "callback_ip", "callback_port")
      .as[(Long, String, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, ip, port) =>
      val ipL = (id * 2654435761L) % 4294967296L
      val expIp = Seq(ipL >>> 24, (ipL >>> 16) & 255, (ipL >>> 8) & 255, ipL & 255).mkString(".")
      assert(ip === expIp, s"trigger $id")
      assert(port === (id * 131 % 65535 + 1).toInt, s"trigger $id")
    }
  }

  test("payload build/extract round-trips at the byte level") {
    val key = Array.tabulate[Byte](20)(_.toByte)
    val p = TriggerPipeline.buildPayload(7L, key)
    assert(p.length === TriggerPipeline.PayloadLen)
    val pkt = TriggerPipeline.buildPacket(7L, key)
    assert(pkt.length === 2 + TriggerPipeline.PadLen + TriggerPipeline.PayloadLen)
    // crc in header matches payload crc
    val crc = ((pkt(0) & 0xFF) << 8) | (pkt(1) & 0xFF)
    assert(crc === graft.functions.CodecImpl.crc16(p))
  }
}
