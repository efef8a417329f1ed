package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CodecExpressions => CE, CodecImpl}

/** Trigger-packet pipeline (SURVEY §3.2 / §2.3): raw packets carrying
  * an obfuscated 29-byte payload, recovered and validated by the gate
  * chain the reference applies — length bounds → payload extraction at
  * a crc-derived offset → sliding-XOR + seed-XOR deobfuscation → CRC
  * recheck over the zeroed-crc struct → validator (u16 divisible by
  * 127) → hashed-key semi-join (`server/trigger_payload.c:35-241`,
  * `trigger_listen.c:202-232`).
  *
  * Packet layout (engine-defined, reference-patterned): 2-byte BE crc
  * of the clear payload · `PadLen` pad bytes (the XOR key region) ·
  * the 29-byte payload field, seed-XOR obfuscated then sliding-XOR'ed
  * against the pad window at offset `crc % (PadLen - PayloadLen)` —
  * key region and payload field are disjoint, as in the reference.
  * Payload: seed u8 · callback_ip u32 · callback_port u16 ·
  * validator u16 · key_hash 20 B (trigger_payload.h:32-39 shape).
  */
object TriggerPipeline {

  val PayloadLen = 29
  val PadLen = 84
  final case class RawTrigger(trigger_id: Long, packet: Array[Byte])

  /** Build one clear payload from derived fields. */
  def buildPayload(id: Long, keyHash: Array[Byte]): Array[Byte] = {
    require(keyHash.length == 20)
    val ip = (id * 2654435761L) % 4294967296L
    val port = (id * 131 % 65535 + 1).toInt
    val validator = ((id % 500) * 127).toInt // divisible by 127
    val out = new Array[Byte](PayloadLen)
    out(0) = ((id % 255) + 1).toByte // seed, never zero
    out(1) = (ip >>> 24).toByte; out(2) = (ip >>> 16).toByte
    out(3) = (ip >>> 8).toByte; out(4) = ip.toByte
    out(5) = (port >>> 8).toByte; out(6) = port.toByte
    out(7) = (validator >>> 8).toByte; out(8) = validator.toByte
    System.arraycopy(keyHash, 0, out, 9, 20)
    out
  }

  /** Deterministic packet per id (generation is harness, not engine). */
  def buildPacket(id: Long, keyHash: Array[Byte]): Array[Byte] = {
    val payload = buildPayload(id, keyHash)
    val crc = CodecImpl.crc16(payload)
    val pad = new Array[Byte](PadLen)
    var st = id * 6364136223846793005L + 1442695040888963407L
    for (i <- pad.indices) { st = st * 6364136223846793005L + 1442695040888963407L; pad(i) = (st >>> 56).toByte }
    val off = crc % (PadLen - PayloadLen)
    val obf = CodecImpl.seedXor(payload)
    val embedded = CodecImpl.slidingXor(obf, pad, off) // XOR against the pad window
    val out = new Array[Byte](2 + PadLen + PayloadLen)
    out(0) = (crc >>> 8).toByte; out(1) = crc.toByte
    System.arraycopy(pad, 0, out, 2, PadLen)
    System.arraycopy(embedded, 0, out, 2 + PadLen, PayloadLen)
    out
  }

  /** Synthetic corpus: one packet per event; ~1/7 get a corrupted crc
    * byte (tamper channel).
    */
  def syntheticTriggers(spark: SparkSession, dir: String): Dataset[RawTrigger] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
      .map { case (eid, uid) =>
        val keyHash = java.security.MessageDigest.getInstance("SHA-1")
          .digest(s"key-${uid % 7}".getBytes)
        val pkt = buildPacket(eid, keyHash)
        if (eid % 7 == 6) pkt(1) = (pkt(1) ^ 0x55).toByte // tamper
        RawTrigger(eid, pkt)
      }
  }

  /** The decode/validate gate chain as one declarative plan. Returns
    * all packets with a verdict; accepted rows carry decoded fields.
    */
  def decode(spark: SparkSession, triggers: DataFrame,
      acceptedKeyHashes: DataFrame): DataFrame = {
    val crc = conv(hex(expr("substring(packet, 1, 2)")), 16, 10).cast("int")
    val pad = expr(s"substring(packet, 3, $PadLen)")
    val off = (col("crc") % (PadLen - PayloadLen)).cast("int")
    val window = expr(s"substring(packet, ${3 + PadLen}, $PayloadLen)")
    val obf = CE.sliding_xor(col("window"), col("pad"), col("off"))
    val payload = CE.seed_xor(col("obf")) // involution: deobfuscate
    // crc recheck is over the clear payload (crc field kept separate
    // in this layout, so no zeroing dance is needed)
    val crcOk = CE.crc16_ccitt(col("payload")) === col("crc")
    val validator = conv(hex(expr("substring(payload, 8, 2)")), 16, 10).cast("int")
    val keyHash = expr(s"substring(payload, 10, 20)")

    val staged = triggers
      .withColumn("len_ok", length(col("packet")) === 2 + PadLen + PayloadLen)
      .withColumn("crc", crc)
      .withColumn("pad", pad)
      .withColumn("off", off)
      .withColumn("window", window)
      .withColumn("obf", obf)
      .withColumn("payload", payload)
      .withColumn("crc_ok", crcOk)
      .withColumn("validator", validator)
      .withColumn("validator_ok", col("validator") % 127 === 0)
      .withColumn("key_hash", keyHash)

    val keyed = staged.join(broadcast(
        acceptedKeyHashes.select(col("key_hash").as("accepted_hash"),
          lit(true).as("key_ok"))),
      staged("key_hash") === col("accepted_hash"), "left")

    keyed.select(
      col("trigger_id"),
      when(!col("len_ok"), "bad_length")
        .when(!col("crc_ok"), "bad_crc")
        .when(!col("validator_ok"), "bad_validator")
        .when(col("key_ok").isNull, "unknown_key")
        .otherwise("accepted").as("verdict"),
      when(col("crc_ok"),
        concat_ws(".",
          conv(hex(expr("substring(payload, 2, 1)")), 16, 10),
          conv(hex(expr("substring(payload, 3, 1)")), 16, 10),
          conv(hex(expr("substring(payload, 4, 1)")), 16, 10),
          conv(hex(expr("substring(payload, 5, 1)")), 16, 10))).as("callback_ip"),
      when(col("crc_ok"),
        conv(hex(expr("substring(payload, 6, 2)")), 16, 10).cast("int")).as("callback_port"))
  }

  /** End-to-end over the synthetic corpus: accepted keys are the
    * even-numbered implant keys (odd keys → unknown_key channel).
    */
  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = (0 until 7 by 2).map { k =>
      java.security.MessageDigest.getInstance("SHA-1").digest(s"key-$k".getBytes)
    }.toDF("key_hash")
    decode(spark, syntheticTriggers(spark, dir).toDF(), keys)
  }
}
