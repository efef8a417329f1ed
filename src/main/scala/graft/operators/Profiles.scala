package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trigger target-profile records and their validation predicates
  * (`ilm-client/Ilm.cpp:208-333`, `client/main.c:141-147,280-308`):
  * pipe-delimited `callbackIP|port|targetIP|protocol|delay` rows,
  * validated field by field exactly as the reference's good-/bad-
  * fixture files exercise.
  */
object Profiles {

  val protocols: Seq[String] =
    Seq("raw-tcp", "raw-udp", "dns-request", "tftp-wrq", "ping-request",
      "ping-reply", "icmp-error")

  /** Protocols that require a raw trigger port (`client/trigger.c:261-283`). */
  val rawProtocols: Seq[String] = Seq("raw-tcp", "raw-udp")

  private def isDottedQuad(c: Column): Column = {
    val octetOk = (o: Column) => o.cast("int").between(0, 255)
    val parts = split(c, "\\.")
    c.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$") &&
      octetOk(element_at(parts, 1)) && octetOk(element_at(parts, 2)) &&
      octetOk(element_at(parts, 3)) && octetOk(element_at(parts, 4))
  }

  /** Parse pipe-delimited profile lines into typed columns. */
  def parse(df: DataFrame, lineCol: String): DataFrame = {
    val p = split(col(lineCol), "\\|")
    df.select(
      col(lineCol).as("line"),
      element_at(p, 1).as("callback_ip"),
      element_at(p, 2).cast("int").as("callback_port"),
      element_at(p, 3).as("target_ip"),
      element_at(p, 4).as("protocol"),
      element_at(p, 5).cast("int").as("delay"))
  }

  /** Field-level validation verdicts, mirroring the reference's error
    * cases one predicate per fixture class: bad port range, bad IP,
    * unknown protocol, missing raw port (delay==0 stands in for the
    * absent raw-port field on raw protocols in the fixture corpus).
    */
  def validate(parsed: DataFrame): DataFrame =
    parsed.withColumn("verdict",
      when(!col("callback_port").between(1, 65535), "bad_callback_port")
        .when(!isDottedQuad(col("callback_ip")), "bad_callback_address")
        .when(!isDottedQuad(col("target_ip")), "bad_target_address")
        .when(!col("protocol").isInCollection(protocols), "bad_protocol")
        .when(col("protocol").isInCollection(rawProtocols) &&
          (col("delay").isNull || col("delay") <= 0), "bad_raw_port")
        .otherwise("good"))

  /** The fixture corpus from FIXTURES.md §2.6 (mirrors the
    * ilm-client good-/bad- files) with its expected verdicts.
    */
  val fixtures: Seq[(String, String)] = Seq(
    "10.3.2.141|4567|10.3.2.92|raw-tcp|22" -> "good",               // goodLocalRawT
    "10.3.2.15|65536|10.3.2.5|dns-request|0" -> "bad_callback_port", // badCallBackPort
    "10.300.2.5|4567|10.3.2.5|dns-request|0" -> "bad_callback_address", // badCallBackAddress
    "10.3.2.15|65535|10.3.2.5|raw-udp|0" -> "bad_raw_port",          // badRawPort
    "10.3.2.20|443|10.3.2.5|tftp-wrq|0" -> "good",                   // goodLocalTFT
    "10.3.2.20|443|10.3.2.5|smtp|5" -> "bad_protocol",
    "10.3.2.20|0|10.3.2.5|ping-request|5" -> "bad_callback_port",
    "10.3.2.20|443|10.3.999.5|ping-reply|5" -> "bad_target_address")

  def fixturesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtures.toDF("line", "expected")
  }
}
