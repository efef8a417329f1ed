package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dims, Surveys}
import graft.functions.{CodecExpressions => CE}

/** The flagship end-to-end ingest DAG (SURVEY §3.3): beacon records →
  * TLV decode → survey child-table parsing → dimension enrichment →
  * longest-prefix gateway match → good/bad routing → partitioned
  * parquet, mirroring honeycomb's listen→parse→RSI→processRSI→archive
  * pipeline as one declarative Spark job.
  *
  * The corpus is generated deterministically from the driver's events
  * table (beacon per event; implant per user) with real TLV-encoded
  * payloads, so the decode path is exercised byte-for-byte. A slice of
  * beacons carries an unknown TLV type — the parse_error channel
  * (`honeycomb.py:246-247`) that routes to the bad sink.
  *
  * Scale: every stage is a narrow projection or a broadcast join
  * except the survey explodes (linear) and the final write; output is
  * partitioned by beacon date (daily pruning); at 100 TB the landing
  * tables additionally bucket by implant for co-located session joins
  * (`plans/BucketedLayout.scala`, shuffle-free paths pinned by
  * BucketedLayoutSpec).
  */
object BeaconPipeline {

  private def octet(ip: Column, shift: Int): Column =
    floor(ip.cast("double") / math.pow(256, shift).toLong).cast("bigint") % 256

  private def hexByte(c: Column): Column = lpad(hex(c), 2, "0")

  /** /proc/net-style little-endian hex addr "0100007F:1F90". */
  private def hexAddr(ip: Column, port: Column): Column =
    concat(hexByte(octet(ip, 0)), hexByte(octet(ip, 1)),
      hexByte(octet(ip, 2)), hexByte(octet(ip, 3)),
      lit(":"), lpad(hex(port), 4, "0"))

  /** Deterministic beacon corpus derived from events (one beacon per
    * event; one implant per user). ~10% of beacons get an unknown TLV
    * type; ~10% are version 22 (pre-compression wire version).
    *
    * The TLV payload is assembled by the native `beacon_raw_tlv`
    * expression (one static call per row inside whole-stage codegen);
    * the original Column formulation is kept as
    * [[beaconRawTlvColumns]] and PayloadParitySpec pins byte-for-byte
    * equality between the two over a dense residue grid, so the
    * corpus bytes — and every decode gate downstream — are unchanged.
    */
  def syntheticBeacons(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val uid = col("user_id")
    val eid = col("event_id")
    val dialect = when(uid % 3 === 0, "linux").when(uid % 3 === 1, "solaris").otherwise("mikrotik")
    e.select(
      concat(lit("imp-"), uid).as("implant_id"),
      col("ts").as("beacon_ts"),
      when(eid % 10 === 0, 22).otherwise(29).as("version"),
      (uid % 70).cast("int").as("os_code"),
      dialect.as("dialect"),
      CE.beacon_raw_tlv(uid, eid).as("raw_tlv"))
  }

  /** The original Column formulation of the beacon TLV payload —
    * retained as the parity reference for the native
    * `beacon_raw_tlv` expression (PayloadParitySpec compares the two
    * byte-for-byte; see [[syntheticBeacons]]).
    */
  def beaconRawTlvColumns(uid: Column, eid: Column): Column = {
    val ip = (eid * 2654435761L) % 4294967296L
    val gwIp = (uid * 16843009L + 167772161L) % 4294967296L
    val macHex = lpad(hex(uid * 131071 % 281474976710656L), 12, "0")
    val mac = lower(concat_ws("-", (0 until 6).map(i => substring(macHex, 1 + 2 * i, 2)): _*))
    val dialect = when(uid % 3 === 0, "linux").when(uid % 3 === 1, "solaris").otherwise("mikrotik")

    val procBlob = concat(
      format_string("%d (beacond) S %d %d %d", (eid % 32768).cast("int"),
        (uid % 1000).cast("int"), (uid % 100).cast("int"), (eid % 100).cast("int")),
      lit("\n"),
      format_string("%d (survey) R %d %d %d", ((eid + 1) % 32768).cast("int"),
        (eid % 32768).cast("int"), (uid % 100).cast("int"), (eid % 100).cast("int")))

    val netstatAn = concat(
      lit("  0: "), hexAddr(ip, uid % 65536), lit(" "), hexAddr(gwIp, lit(443)),
      lit(" "), hexByte((eid % 11 + 1).cast("int")), lit(" "),
      hexByte(eid % 256), lit(":"), hexByte(uid % 256))

    val netstatRn = concat(
      lit("eth0 "), hexByte(octet(ip, 0)), hexByte(octet(ip, 1)), hexByte(octet(ip, 2)),
      hexByte(octet(ip, 3)), lit(" "),
      hexByte(octet(gwIp, 0)), hexByte(octet(gwIp, 1)), hexByte(octet(gwIp, 2)),
      hexByte(octet(gwIp, 3)),
      lit(" 0003 0 0 0 00FFFFFF 1500 0 0"))

    val ipconfig = when(dialect === "linux", concat(
        lit("eth0      Link encap:Ethernet  HWaddr "), upper(translate(mac, "-", ":")),
        lit("\n          inet addr:"), dottedIp(ip), lit("  Mask:255.255.255.0")))
      .when(dialect === "solaris", concat(
        lit("e1000g0: flags=1000843<UP> mtu 1500\n\tinet "), dottedIp(ip),
        lit(" netmask ffffff00\n\tether "), translate(mac, "-", ":")))
      .otherwise(concat(
        lit("0 R name=\"ether1\" mac-address="), upper(translate(mac, "-", ":")),
        lit(" address="), dottedIp(ip), lit("/24")))

    val knownTlv = array(
      struct(lit(1).as("type"), mac.cast("binary").as("value")),
      struct(lit(2).as("type"), (uid * 37 % 864000).cast("string").cast("binary").as("value")),
      struct(lit(3).as("type"), procBlob.cast("binary").as("value")),
      struct(lit(4).as("type"), ipconfig.cast("binary").as("value")),
      struct(lit(5).as("type"), netstatRn.cast("binary").as("value")),
      struct(lit(6).as("type"), netstatAn.cast("binary").as("value")),
      struct(lit(7).as("type"), (eid % 86400).cast("string").cast("binary").as("value")))
    val withUnknown = concat(knownTlv,
      array(struct(lit(99).as("type"), lit("??").cast("binary").as("value"))))

    CE.tlv_encode(when(eid % 10 === 3, withUnknown).otherwise(knownTlv))
  }

  private def dottedIp(ip: Column): Column =
    concat_ws(".", octet(ip, 3), octet(ip, 2), octet(ip, 1), octet(ip, 0))

  // ------------------------------------------------- v1 wire format

  /** Version-1 beacon record (`honeycomb/honeycomb.py:388-410`): a
    * fixed 32-byte first payload — the 17-byte formatted MAC string at
    * offset 0 (`unpack_from('17s', ptext, 0)`), 3 alignment pad bytes,
    * the network-order uint32 uptime at offset 20
    * (`ntohl(unpack_from('L', ptext, 20))`), zero-padded to 32 bytes.
    * The 32-byte length IS the version dispatch signal
    * (`honeycomb.py:474-481`: first payload of exactly 32 bytes → v1;
    * anything else → v2 with a size preamble).
    */
  def v1Record(mac: Column, uptimeS: Column): Column =
    concat(mac.cast("binary"), unhex(lit("000000")),
      unhex(lpad(hex(uptimeS.cast("bigint") % 4294967296L), 8, "0")),
      unhex(lit("0000000000000000")))

  /** v1 field extraction: MAC text at bytes [1,17], big-endian uptime
    * at [21,24] (ntohl of the wire word). Pure builtin slicing — stays
    * inside whole-stage codegen.
    */
  def decodeV1(payload: Column): Column = struct(
    substring(payload, 1, 17).cast("string").as("mac"),
    conv(hex(substring(payload, 21, 4)), 16, 10).cast("bigint").as("uptime_s"))

  /** Mixed-version wire corpus + length dispatch: ids ≡ 1 (mod 4)
    * emit the 32-byte v1 record, the rest a 3-field v2 TLV payload
    * (mac, uptime, next-beacon → ≥ 35 bytes, never 32, so the length
    * dispatch is unambiguous by construction). Decode branches on
    * `octet_length(payload) == 32` exactly as the LP does, yielding a
    * uniform (rec_id, ver, mac, uptime_s) schema from both formats —
    * the legacy-corpus ingest path a real LP analytics user hits
    * first.
    */
  def decodeMixedWire(e: DataFrame): DataFrame = {
    val uid = col("user_id")
    val eid = col("event_id")
    val macHex = lpad(hex(uid * 131071 % 281474976710656L), 12, "0")
    val mac = lower(concat_ws("-", (0 until 6).map(i => substring(macHex, 1 + 2 * i, 2)): _*))
    val uptime = (uid * 37 % 864000).cast("bigint")
    val v2 = CE.tlv_encode(array(
      struct(lit(1).as("type"), mac.cast("binary").as("value")),
      struct(lit(2).as("type"), uptime.cast("string").cast("binary").as("value")),
      struct(lit(7).as("type"), (eid % 86400).cast("string").cast("binary").as("value"))))
    val wire = e.select(eid.as("rec_id"),
      when(eid % 4 === 1, v1Record(mac, uptime)).otherwise(v2).as("payload"))
    val isV1 = octet_length(col("payload")) === 32
    val v1f = decodeV1(col("payload"))
    // null-gate the TLV walk on v1 rows at the SOURCE (not just via
    // CaseWhen laziness) so it can never throw on a v1 record even if
    // codegen subexpression elimination hoists it. The walk itself is
    // materialized BELOW the field extractors (higher-order filters
    // are CodegenFallback — no subexpression elimination inside them,
    // so an inlined child would re-parse once per extracted field;
    // see decode()).
    val fields = col("_tlv_fields")
    def tlvField(t: Int): Column =
      element_at(filter(fields, f => f.getField("type") === t), 1).getField("value")
    wire
      .withColumn("_tlv_fields", CE.tlv_decode(when(isV1, lit(null).cast("binary"))
        .otherwise(col("payload"))))
      .select(col("rec_id"),
      when(isV1, 1).otherwise(2).as("ver"),
      when(isV1, v1f.getField("mac"))
        .otherwise(tlvField(1).cast("string")).as("mac"),
      when(isV1, v1f.getField("uptime_s"))
        .otherwise(tlvField(2).cast("string").cast("bigint")).as("uptime_s"))
  }

  /** Compressed-wire corpus + version-gated decode — the bzip2 codec
    * seam carrying REAL bytes: `server/compression.c:13-31` compresses
    * the survey packet client-side (block size 9),
    * `honeycomb.py:209-213` decompresses iff version ≥ 23. ids ≡ 0
    * (mod 3) emit version 22 (plain TLV on the wire, the
    * pre-compression format); the rest version 29, their TLV payload
    * genuinely bzip2-compressed. The type-3 survey blob is repetitive
    * proc-style text so compression actually shrinks the record, and
    * every output field is derived THROUGH the decompressed bytes —
    * so a passthrough "codec" fails the BZh magic/shrink receipts and
    * a wrong decompress fails the field hash.
    *
    * Scale: per-row codec work inside whole-stage codegen (static-call
    * expressions), no shuffle at all — the 100 TB shape is "decompress
    * where the scan runs".
    */
  def decodeCompressedWire(e: DataFrame): DataFrame =
    decodeWirePayloads(compressedWireCorpus(e))

  /** The synthetic mixed-version wire corpus: (rec_id, version,
    * payload) where v29 payloads are genuinely bzip2-compressed TLV
    * and v22 plain TLV. Client-side compression cost lives HERE (as it
    * does on the implants); [[decodeWirePayloads]] is the analytics
    * side.
    */
  def compressedWireCorpus(e: DataFrame): DataFrame = {
    val uid = col("user_id")
    val eid = col("event_id")
    val macHex = lpad(hex(uid * 131071 % 281474976710656L), 12, "0")
    val mac = lower(concat_ws("-", (0 until 6).map(i => substring(macHex, 1 + 2 * i, 2)): _*))
    val uptime = (uid * 37 % 864000).cast("bigint")
    val blob = repeat(concat(lit("pid="), (eid % 32768).cast("string"),
      lit(" state=S name=beacond\n")), 16)
    val tlv = CE.tlv_encode(array(
      struct(lit(1).as("type"), mac.cast("binary").as("value")),
      struct(lit(2).as("type"), uptime.cast("string").cast("binary").as("value")),
      struct(lit(3).as("type"), blob.cast("binary").as("value"))))
    e.select(eid.as("rec_id"),
      when(eid % 3 === 0, 22).otherwise(29).as("version"),
      when(eid % 3 === 0, tlv).otherwise(CE.bz2_compress(tlv)).as("payload"))
  }

  /** Version-gated decode over an already-landed wire table
    * (rec_id, version, payload) — the shape a real LP analytics user
    * runs against archived beacon records.
    */
  def decodeWirePayloads(wire: DataFrame): DataFrame = {
    val isC = col("version") >= 23
    // 1 MiB cap: survey payloads are KBs; anything larger is a bomb.
    // Decompression AND the TLV walk are materialized in a projection
    // BELOW the field extractors: the extractors are higher-order
    // filters (CodegenFallback — no subexpression elimination inside
    // them), so inlining plainPay/fields as their children would
    // re-run the bzip2 decompress + parse once per extracted field
    // (see decode()).
    val plainPay = col("_plain_pay")
    val fields = col("_tlv_fields")
    def tlvField(t: Int): Column =
      element_at(filter(fields, f => f.getField("type") === t), 1).getField("value")
    val hasMagic = hex(substring(col("payload"), 1, 3)) === "425A68" // "BZh"
    wire
      .withColumn("_plain_pay",
        when(isC, CE.bz2_decompress(col("payload"), lit(1 << 20)))
          .otherwise(col("payload")))
      .withColumn("_tlv_fields", CE.tlv_decode(plainPay))
      .select(col("rec_id"), col("version"),
      tlvField(1).cast("string").as("mac"),
      tlvField(2).cast("string").cast("bigint").as("uptime_s"),
      octet_length(tlvField(3)).as("blob_len"),
      // real-bytes receipts: v>=23 wire records carry the BZh stream
      // magic (plain TLV starts with type byte 0x01, so a passthrough
      // can never fake this) and genuinely shrank vs the decompressed
      // payload; v<23 records must NOT look compressed
      when(isC, hasMagic).otherwise(!hasMagic).as("magic_ok"),
      (!isC || octet_length(col("payload")) < octet_length(plainPay)).as("shrunk"))
  }

  /** Decoded beacon: TLV fields back to named columns (version-aware —
    * `honeycomb.py:209-213` gates bz2 on version ≥ 23; the wire-level
    * decompression itself is exercised with real bytes by
    * [[decodeCompressedWire]] / gate ig_bz2_wire).
    */
  def decode(beacons: DataFrame): DataFrame = {
    // ONE TLV walk per record: the field extractors are higher-order
    // filters, which are CodegenFallback in Spark 4 — whole-stage
    // codegen's subexpression elimination does not reach inside them,
    // so writing tlv_decode(raw_tlv) as each extractor's child
    // re-parsed the full multi-KB payload NINE times per row (8
    // fields + the parse_error scan; measured ~4x the whole gate).
    // Materializing the decoded array in a projection BELOW the
    // extractors pins one parse — CollapseProject keeps the two
    // Projects apart because the producer expression is non-cheap and
    // referenced 9 times (the §2 tokenize-below-the-generator fix
    // applied to the TLV family).
    val fields = col("_tlv_fields")
    def field(t: Int): Column =
      element_at(filter(fields, f => f.getField("type") === t), 1).getField("value")
    beacons
      .withColumn("_tlv_fields", CE.tlv_decode(col("raw_tlv")))
      .select(
      col("implant_id"), col("beacon_ts"), col("version"), col("os_code"), col("dialect"),
      field(1).cast("string").as("mac"),
      field(2).cast("string").cast("bigint").as("uptime_s"),
      field(3).cast("string").as("proc_blob"),
      field(4).cast("string").as("ipconfig_blob"),
      field(5).cast("string").as("netstat_rn_blob"),
      field(6).cast("string").as("netstat_an_blob"),
      field(7).cast("string").cast("int").as("next_beacon_s"),
      (size(filter(fields, f => f.getField("type") > 7 || f.getField("type") < 1)) > 0)
        .as("parse_error"))
  }

  /** Full pipeline result: enriched beacons + child tables. */
  final case class Result(
      good: DataFrame, bad: DataFrame,
      processes: DataFrame, sockets: DataFrame, routes: DataFrame, interfaces: DataFrame)

  /** Decoded + dimension-enriched beacons with the routing predicate
    * materialized as a column (single pass; branch filters are cheap
    * on top).
    */
  def enriched(spark: SparkSession, dir: String): DataFrame =
    decode(syntheticBeacons(spark, dir))
      .join(broadcast(Dims.osCodesDf(spark)), Seq("os_code"), "left")
      .withColumn("os_name", coalesce(col("os_name"), lit("Unknown")))
      .withColumn("d", col("beacon_ts").cast("date"))
      // pipeline observability: row/error counters ride the plan for
      // free (no extra pass) and surface in QueryExecution.observedMetrics
      .observe("ingest_metrics",
        count(lit(1)).as("rows"),
        sum(when(col("parse_error"), 1L).otherwise(0L)).as("parse_errors"),
        sum(when(col("os_name") === "Unknown", 1L).otherwise(0L)).as("unknown_os"))

  def build(spark: SparkSession, dir: String): Result = {
    val enriched = this.enriched(spark, dir)

    val bad = enriched.filter(col("parse_error") || col("uptime_s") < 0)
    val good = enriched.filter(!(col("parse_error") || col("uptime_s") < 0))

    val processes = Surveys.parseProcessList(good, "proc_blob")
    val sockets = Surveys.parseSockets(good, "netstat_an_blob", "tcp")
      .join(broadcast(Dims.tcpStatesDf(spark)), Seq("state_code"), "left")
      .withColumn("state", coalesce(col("state_name"), lit("UNKNOWN")))
      .drop("state_name")
    val routes = Surveys.parseRoutes(good, "netstat_rn_blob")
    val interfaces = Surveys.parseInterfaces(
      good.withColumnRenamed("ipconfig_blob", "blob"), "blob")

    Result(good, bad, processes, sockets, routes, interfaces)
  }

  /** Land the query-layer tables of the beacon DAG BUCKETED by implant
    * (reference analog: honeycomb's archive layer feeding per-implant
    * queries) — the 100 TB landing format `BucketedLayout` proves in
    * isolation, wired into the flagship pipeline:
    *
    *  - `graft_beacons_b<sf>`:  good beacons, bucketBy(implant_id),
    *    per-bucket sorted by (implant_id, beacon_us);
    *  - `graft_sessions_b<sf>`: gap-sessionized (1h idle) session
    *    bounds per implant, same bucket spec.
    *
    * Sessionization pays its one per-implant shuffle HERE, at landing;
    * every downstream beacon↔session join and per-implant aggregation
    * then reads co-partitioned buckets and plans with zero Exchange
    * (pinned by BucketedLayoutSpec on the landed tables). Tables are
    * external under java.io.tmpdir, names suffixed by the scale dir so
    * concurrent scale factors never collide.
    *
    * @return (beaconsTable, sessionsTable)
    */
  def landBucketed(spark: SparkSession, dir: String,
      nBuckets: Int = 8): (String, String) = {
    import org.apache.spark.sql.expressions.Window
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val beaconsT = s"graft_beacons_b_$suffix"
    val sessionsT = s"graft_sessions_b_$suffix"
    val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed"

    // landing is idempotent per (session, scale dir): once both tables
    // exist, callers get the names back without re-running the decode
    // DAG or the writes — landing cost is paid once, every later
    // beacon↔session query measures only its own zero-Exchange read
    if (spark.catalog.tableExists(beaconsT) && spark.catalog.tableExists(sessionsT))
      return (beaconsT, sessionsT)

    val good = enriched(spark, dir)
      .filter(!(col("parse_error") || col("uptime_s") < 0))
      .select(col("implant_id"), unix_micros(col("beacon_ts")).as("beacon_us"),
        col("uptime_s"), col("version"))
    BucketedLayout.write(good, beaconsT, "implant_id", nBuckets,
      Seq("implant_id", "beacon_us"), Some(s"$base/$beaconsT"))

    // sessions derive FROM the landed archive, not from a second run
    // of the decode DAG: the narrow bucketed scan replaces the whole
    // synth+TLV subtree, and the sessionization window reads buckets
    // already co-partitioned on implant_id
    val w = Window.partitionBy("implant_id").orderBy("beacon_us")
    val sessions = spark.table(beaconsT)
      .withColumn("prev_us", lag(col("beacon_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("beacon_us") - col("prev_us") > 3600L * 1000000L, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("implant_id", "session_no")
      .agg(min(col("beacon_us")).as("started"), max(col("beacon_us")).as("ended"))
    BucketedLayout.write(sessions, sessionsT, "implant_id", nBuckets,
      Seq("implant_id", "session_no"), Some(s"$base/$sessionsT"))

    (beaconsT, sessionsT)
  }

  /** Run end-to-end and land partitioned parquet (daily partitions;
    * good/bad routed to separate sinks like processRSI's good/bad
    * dirs).
    */
  def run(spark: SparkSession, dir: String, outDir: String): Result = {
    val r = build(spark, dir)
    r.good.drop("raw_tlv").write.mode("overwrite")
      .partitionBy("d").parquet(s"$outDir/beacons_good")
    r.bad.drop("raw_tlv").write.mode("overwrite")
      .partitionBy("d").parquet(s"$outDir/beacons_bad")
    r.processes.write.mode("overwrite").parquet(s"$outDir/processes")
    r.sockets.write.mode("overwrite").parquet(s"$outDir/sockets")
    r.routes.write.mode("overwrite").parquet(s"$outDir/routes")
    r.interfaces.write.mode("overwrite").parquet(s"$outDir/interfaces")
    r
  }
}
