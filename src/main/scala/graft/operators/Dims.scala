package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Broadcast dimension tables of the reference's decode steps
  * (FIXTURES.md §2.5). Tiny and static — always broadcast, never
  * shuffled.
  */
object Dims {

  /** OS code → name, incl. legacy codes
    * (`server/beacon.h:20-32`, `honeycomb/honeycomb.py:252-286`).
    */
  val osCodes: Seq[(Int, String)] = Seq(
    0 -> "Undefined",
    1 -> "Linux-x86 (legacy)", 2 -> "Solaris-SPARC (legacy)", 3 -> "MikroTik-MIPSBE (legacy)",
    5 -> "Solaris-x86 (legacy)",
    10 -> "Windows", 20 -> "Linux-x86", 21 -> "Linux-x86_64",
    30 -> "Solaris-SPARC", 31 -> "Solaris-x86",
    40 -> "MikroTik-MIPSBE", 41 -> "MikroTik-MIPSLE", 42 -> "MikroTik-x86", 43 -> "MikroTik-PPC",
    50 -> "Ubiquiti-MIPS", 61 -> "AVTech-ARM")

  /** TCP state code → name (`server/netstat_an.c:348-389`). */
  val tcpStates: Seq[(Int, String)] = Seq(
    1 -> "ESTABLISHED", 2 -> "SYN_SENT", 3 -> "SYN_RECV", 4 -> "FIN_WAIT1",
    5 -> "FIN_WAIT2", 6 -> "TIME_WAIT", 7 -> "CLOSE", 8 -> "CLOSE_WAIT",
    9 -> "LAST_ACK", 10 -> "LISTEN", 11 -> "CLOSING")

  /** Internal → public IP remap, 10-row shape
    * (`honeycomb/processRSI.py:364-385`); synthetic addresses.
    */
  val ipRemap: Seq[(String, String)] = (1 to 10).map { i =>
    s"10.1.1.$i" -> s"198.51.100.$i"
  }

  def osCodesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    osCodes.toDF("os_code", "os_name")
  }

  def tcpStatesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tcpStates.toDF("state_code", "state_name")
  }

  def ipRemapDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ipRemap.toDF("internal_ip", "public_ip")
  }
}
