package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CodecExpressions => CE, CodecImpl}

/** The codec Catalyst expressions exercised through real Spark plans —
  * Column API, SQL registration, and generator-style explode of
  * tlv_decode.
  */
class CodecExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("crc16 over a column matches the pure implementation") {
    import spark.implicits._
    val rows = Seq("123456789", "", "hello graft").map(_.getBytes("ASCII"))
    val got = rows.toDF("b").select(CE.crc16_ccitt(col("b"))).as[Int].collect()
    assert(got.toSeq === rows.map(CodecImpl.crc16).toSeq)
    assert(got(0) === 0x29B1)
  }

  test("bthp frame/strip round-trips through a plan, SQL registration included") {
    import spark.implicits._
    val row = Seq(("message-bytes", 77L)).toDF("msg", "pid")
      .select(CE.bthp_strip(CE.bthp_frame(col("msg").cast("binary"), col("pid"),
        lit("10.1.2.3"), lit(null).cast("string"))).as("h"))
      .select(col("h.proxy_id"), col("h.beacon_ip"), col("h.dst_ip"),
        col("h.payload").cast("string"))
      .head()
    assert(row.getLong(0) === 77L)
    assert(row.getString(1) === "10.1.2.3")
    assert(row.isNullAt(2))
    assert(row.getString(3) === "message-bytes")
    graft.functions.CodecExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT bthp_strip(bthp_frame(CAST('x' AS BINARY), 5L, '9.8.7.6', NULL)).proxy_id AS p")
      .head().getLong(0)
    assert(viaSql === 5L)
    // ExpectsInputTypes: an INT-literal proxy id coerces to BIGINT at
    // analysis instead of ClassCastException-ing at runtime
    val intLit = spark.sql(
      "SELECT bthp_strip(bthp_frame(CAST('x' AS BINARY), 5, '9.8.7.6', NULL)).proxy_id AS p")
      .head().getLong(0)
    assert(intLit === 5L)
  }

  test("xtea encrypt/decrypt round-trips through a plan") {
    import spark.implicits._
    val key = Array.tabulate[Byte](16)(_.toByte)
    val pt = "EIGHTBYTESx2!!!!".getBytes("ASCII")
    val back = Seq((pt, key)).toDF("data", "key")
      .select(CE.xtea_decrypt(CE.xtea_encrypt(col("data"), col("key")), col("key")).as("rt"))
      .as[Array[Byte]].head()
    assert(back.sameElements(pt))
  }

  test("tlv_decode explodes into typed per-field rows") {
    import spark.implicits._
    val blob = CodecImpl.tlvEncode(Seq(
      1 -> "00-11-22-33-44-55".getBytes, 2 -> "12345".getBytes, 7 -> "3600".getBytes))
    val out = Seq(Tuple1(blob)).toDF("raw")
      .select(explode(CE.tlv_decode(col("raw"))).as("f"))
      .select(col("f.type").as("t"), col("f.value").cast("string").as("v"))
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "00-11-22-33-44-55"), (2, "12345"), (7, "3600")))
  }

  test("SQL registration: functions callable from spark.sql") {
    CE.register(spark)
    val row = spark.sql(
      """SELECT crc16_ccitt(CAST('123456789' AS BINARY)) AS crc,
        |       mac_format(unhex('001A2B3C4D5E')) AS mac,
        |       size_decode(size_encode(42L)) AS sz,
        |       ip_cksum(unhex('0001f203f4f5f6f7')) AS ck
        |""".stripMargin).head()
    assert(row.getInt(0) === 0x29B1)
    assert(row.getString(1) === "00-1a-2b-3c-4d-5e")
    assert(row.getLong(2) === 42L)
    assert(row.getInt(3) === 0x220D)
  }

  test("aes_frame encode/decode round-trips through a plan, rejects to null") {
    CE.register(spark)
    val key = "repeat('0b', 32)" // deterministic 32-byte key, hex-expanded
    val row = spark.sql(
      s"""SELECT CAST(aes_frame_decode(
         |         aes_frame_encode(CAST('hello session' AS BINARY), unhex($key)),
         |         unhex($key), 65535) AS STRING) AS rt,
         |       aes_frame_decode(
         |         aes_frame_encode(CAST('hello session' AS BINARY), unhex($key)),
         |         unhex($key), 12) AS cap_reject,
         |       aes_frame_decode(unhex('00'), unhex($key), 65535) AS align_reject
         |""".stripMargin).head()
    assert(row.getString(0) === "hello session")
    assert(row.isNullAt(1), "embedded length above cap must reject to null")
    assert(row.isNullAt(2), "non-16-multiple frame must reject to null")
  }

  test("generated code for the kernels compiles (no silent interpreted fallback)") {
    import spark.implicits._
    // with fallback disabled, a janino compile error fails the query
    // instead of silently degrading the stage to interpreted mode
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      val s = emb.select(
        graft.functions.VectorExpressions.dot_f32(col("embedding"), col("embedding")).as("d"),
        graft.functions.VectorExpressions.dot_f32_dec(col("embedding"), col("embedding")).as("dd"))
        .agg(sum(col("d"))).head().getDouble(0)
      assert(s > 0)
      val mac = Seq(Tuple1(Array.tabulate[Byte](6)(_.toByte))).toDF("b")
        .select(CE.mac_format(col("b")),
          CE.crc16_ccitt(col("b")),
          CE.tlv_decode(CE.tlv_encode(array(
            struct(lit(1).as("type"), col("b").as("value"))))))
        .head()
      assert(mac.getString(0) === "00-01-02-03-04-05")
      // text expressions generate code too
      val txt = Seq(("the cat and the dog", "a 'b c' d")).toDF("t", "line")
        .select(graft.functions.TextExpressions.lang_id(col("t")),
          graft.functions.TextExpressions.rolling_fingerprint(col("t")),
          graft.functions.TextExpressions.simhash64(split(col("t"), " ")),
          graft.functions.TextExpressions.argv_tokenize(col("line")))
        .head()
      assert(txt.getString(0) === "en")
      assert(txt.getSeq[String](3) === Seq("a", "b c", "d"))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("null in → null out (no NPE inside a plan)") {
    import spark.implicits._
    val got = Seq(Option.empty[Array[Byte]]).toDF("b")
      .select(CE.crc16_ccitt(col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("key_extract + seed_xor compose inside one projection") {
    import spark.implicits._
    val buf = new Array[Byte](64)
    buf(0) = (3 ^ 5).toByte // offset 3 % 15 = 3... b0^5=6? (3^5)=6 → 6%15=6
    val off = ((buf(0) & 0xFF) ^ 5) % 15
    for (i <- 0 until 16) buf(off + 1 + i) = (i + 1).toByte
    val k = Seq(Tuple1(buf)).toDF("b")
      .select(CE.key_extract(col("b")).as("k")).as[Array[Byte]].head()
    assert(k.sameElements((1 to 16).map(_.toByte)))
  }

  test("text expressions declare inputTypes: coercion at analysis, not runtime CCE") {
    graft.functions.TextExpressions.register(spark)
    // an INT argument to the string-typed functions coerces (int ->
    // string) at analysis time instead of ClassCastException-ing in
    // the executor; hamming64 coerces INT literals to BIGINT
    assert(spark.sql("SELECT lang_id(123) AS l").head().getString(0) != null)
    assert(spark.sql("SELECT fnv1a64(7) AS h").head().getLong(0) ==
      spark.sql("SELECT fnv1a64('7') AS h").head().getLong(0))
    assert(spark.sql("SELECT hamming64(5, 1) AS d").head().getInt(0) === 1)
    assert(spark.sql("SELECT size(argv_tokenize(42)) AS n").head().getInt(0) === 1)
  }
}
