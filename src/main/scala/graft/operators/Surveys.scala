package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survey sub-table parsers (SURVEY §1.1 #4, §2.1): the reference
  * embeds process/socket/route/interface tables as text blobs inside
  * beacon TLV fields; these operators explode the blobs into typed
  * child tables keyed by (implant_id, beacon_ts).
  *
  * All parsing is Column-expression based (split/regexp_extract/conv)
  * so it runs inside whole-stage codegen; the per-OS ifconfig dialects
  * are table-driven regex specs, not per-dialect code
  * (`processRSI.py:120-244` has three hand-written parsers — the spec
  * table is the engine's generalization).
  */
object Surveys {

  /** Split a text blob into trimmed non-empty lines. */
  private def lines(blob: Column): Column =
    filter(transform(split(blob, "\n"), l => trim(l)), l => l =!= "")

  /** `/proc/<pid>/stat`-style process lines:
    * `pid (command) state ppid pgrp session` (`process_list.c:182-227`).
    */
  def parseProcessList(df: DataFrame, blobCol: String): DataFrame = {
    val re = "^(\\d+) \\((.*)\\) (\\S+) (\\d+) (\\d+) (\\d+)"
    df.select(col("implant_id"), col("beacon_ts"),
        explode(lines(col(blobCol))).as("line"))
      .filter(col("line").rlike(re))
      .select(
        col("implant_id"), col("beacon_ts"),
        regexp_extract(col("line"), re, 1).cast("int").as("pid"),
        regexp_extract(col("line"), re, 3).as("state"),
        regexp_extract(col("line"), re, 4).cast("int").as("ppid"),
        regexp_extract(col("line"), re, 5).cast("int").as("pgrp"),
        regexp_extract(col("line"), re, 6).cast("int").as("session"),
        regexp_extract(col("line"), re, 2).as("command"))
  }

  /** `/proc/net/tcp`-style hex address `0100007F:0016` → dotted IP +
    * port. The hex is the kernel's big-endian u32 printed through a
    * little-endian host int, so octets come out reversed
    * (`netstat_an.c:295-328` parses with %X + inet_ntop).
    */
  def hexAddrToIp(hexAddr: Column): Column = {
    val h = substring_index(hexAddr, ":", 1)
    concat_ws(".",
      conv(substring(h, 7, 2), 16, 10),
      conv(substring(h, 5, 2), 16, 10),
      conv(substring(h, 3, 2), 16, 10),
      conv(substring(h, 1, 2), 16, 10))
  }

  def hexAddrToPort(hexAddr: Column): Column =
    conv(substring_index(hexAddr, ":", -1), 16, 10).cast("int")

  /** `/proc/net/{tcp,udp,raw}` socket lines:
    * `sl local:port rem:port st tx:rx ...` (`netstat_an.c:285-328`);
    * decodes state code via the TCP-state dimension downstream.
    */
  def parseSockets(df: DataFrame, blobCol: String, proto: String): DataFrame = {
    val re = "^\\s*\\d+:\\s+([0-9A-Fa-f]{8}:[0-9A-Fa-f]{4})\\s+([0-9A-Fa-f]{8}:[0-9A-Fa-f]{4})\\s+([0-9A-Fa-f]{2})\\s+([0-9A-Fa-f]+):([0-9A-Fa-f]+)"
    val l = regexp_extract(col("line"), re, 1)
    val r = regexp_extract(col("line"), re, 2)
    df.select(col("implant_id"), col("beacon_ts"),
        explode(lines(col(blobCol))).as("line"))
      .filter(col("line").rlike(re))
      .select(
        col("implant_id"), col("beacon_ts"), lit(proto).as("proto"),
        conv(regexp_extract(col("line"), re, 5), 16, 10).cast("bigint").as("rxq"),
        conv(regexp_extract(col("line"), re, 4), 16, 10).cast("bigint").as("txq"),
        hexAddrToIp(l).as("local_ip"), hexAddrToPort(l).as("local_port"),
        hexAddrToIp(r).as("remote_ip"), hexAddrToPort(r).as("remote_port"),
        conv(regexp_extract(col("line"), re, 3), 16, 10).cast("int").as("state_code"))
  }

  /** `/proc/net/route` lines:
    * `iface dest gateway flags refcnt use metric mask mtu window irtt`
    * (`netstat_rn.c:54-226`); hex dest/gateway/mask little-endian like
    * the socket addresses; flag bitmask → letters (U/G/H/D/M).
    */
  def parseRoutes(df: DataFrame, blobCol: String): DataFrame = {
    val re = "^(\\S+)\\s+([0-9A-Fa-f]{8})\\s+([0-9A-Fa-f]{8})\\s+([0-9A-Fa-f]+)\\s+\\d+\\s+\\d+\\s+\\d+\\s+([0-9A-Fa-f]{8})\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)"
    def ip(g: Int): Column = hexAddrToIp(regexp_extract(col("line"), re, g))
    val flagsInt = conv(regexp_extract(col("line"), re, 4), 16, 10).cast("int")
    def flag(mask: Int, letter: String): Column =
      when(flagsInt.bitwiseAND(lit(mask)) =!= 0, letter).otherwise("")
    df.select(col("implant_id"), col("beacon_ts"),
        explode(lines(col(blobCol))).as("line"))
      .filter(col("line").rlike(re))
      .select(
        col("implant_id"), col("beacon_ts"),
        ip(2).as("dest"), ip(3).as("gateway"), ip(5).as("mask"),
        // RTF_UP/GATEWAY/HOST/DYNAMIC/MODIFIED (netstat_rn.c:129-158)
        concat(flag(1, "U"), flag(2, "G"), flag(4, "H"), flag(16, "D"), flag(32, "M")).as("flags"),
        regexp_extract(col("line"), re, 6).cast("int").as("mtu"),
        regexp_extract(col("line"), re, 7).cast("int").as("window"),
        regexp_extract(col("line"), re, 8).cast("int").as("irtt"),
        regexp_extract(col("line"), re, 1).as("iface"))
  }

  /** One ifconfig dialect: how to find the interface name, IPv4, MAC
    * and IPv6 inside an interface stanza.
    */
  final case class IfconfigDialect(
      name: String,
      ifaceRe: String,
      ipv4Re: String,
      macRe: String,
      ipv6Re: String)

  /** The three dialects the reference special-cases
    * (`processRSI.py:120-244`), as data.
    */
  val dialects: Seq[IfconfigDialect] = Seq(
    IfconfigDialect("linux",
      ifaceRe = "^(\\S+)\\s+Link encap",
      ipv4Re = "inet addr:(\\d+\\.\\d+\\.\\d+\\.\\d+)",
      macRe = "HWaddr ([0-9A-Fa-f:]{17})",
      ipv6Re = "inet6 addr: ([0-9A-Fa-f:/]+)"),
    IfconfigDialect("solaris",
      ifaceRe = "^(\\S+): flags=",
      ipv4Re = "inet (\\d+\\.\\d+\\.\\d+\\.\\d+)",
      macRe = "ether ([0-9A-Fa-f:]+)",
      ipv6Re = "inet6 ([0-9A-Fa-f:/%]+)"),
    IfconfigDialect("mikrotik",
      ifaceRe = "name=\"?([A-Za-z0-9_-]+)\"?",
      ipv4Re = "address=(\\d+\\.\\d+\\.\\d+\\.\\d+)",
      macRe = "mac-address=([0-9A-Fa-f:]{17})",
      ipv6Re = "address6=([0-9A-Fa-f:/]+)"))

  /** Parse interface stanzas with a dialect chosen per row by a
    * `dialect` column — the table-driven generalization of the
    * reference's three parsers. Stanzas are blocks separated by blank
    * lines.
    */
  def parseInterfaces(df: DataFrame, blobCol: String): DataFrame = {
    val stanza = explode(filter(
      transform(split(col(blobCol), "\n\\s*\n"), s => trim(s)), s => s =!= "")).as("stanza")
    val base = df.select(col("implant_id"), col("beacon_ts"), col("dialect"), stanza)
    // dispatch on the dialect column; regexes come from the spec table
    def byDialect(extract: IfconfigDialect => Column): Column =
      dialects.foldRight(lit(null).cast("string")) { (d, other) =>
        when(col("dialect") === d.name, extract(d)).otherwise(other)
      }
    base.select(
      col("implant_id"), col("beacon_ts"), col("dialect"),
      byDialect(d => regexp_extract(col("stanza"), d.ifaceRe, 1)).as("name"),
      byDialect(d => regexp_extract(col("stanza"), d.ipv4Re, 1)).as("ipv4"),
      byDialect(d => lower(regexp_extract(col("stanza"), d.macRe, 1))).as("mac"),
      byDialect(d => regexp_extract(col("stanza"), d.ipv6Re, 1)).as("ipv6"))
      .filter(col("name") =!= "")
  }

  /** System uptime across the reference's per-OS source dialects
    * (`survey_uptime.c:17-47` LINUX, `:49-86` SOLARIS) — the last §2.1
    * inventory line, previously modeled as a derived scalar only:
    *
    *  - `linux`: the blob is `/proc/uptime` text; fscanf("%i") reads
    *    the integer part of the first field. Unreadable source (the
    *    fopen-fail path) → uptime 0, src_ok false.
    *  - `solaris`: the blob is a utmpx accounting dump, one
    *    `<ut_line>|<ut_tv.tv_sec>` record per line; the reference
    *    loops getutxent() overwriting boottime on every
    *    `ut_line == "system boot"` record, so the LAST boot record
    *    wins; uptime = now − boottime. Two faithful quirks: with no
    *    boot record boottime stays 0 (uptime = now, `boot_found`
    *    surfaces the degeneracy), and uptime == 0 is the dialect's
    *    only error signal (`:75-80`).
    *  - anything else: no compiled source on that platform → 0,
    *    src_ok false.
    *
    * Returns `STRUCT<uptime_s BIGINT, src_ok BOOLEAN, boot_found
    * BOOLEAN>` (`boot_found` null off-solaris). Pure array/string
    * expressions — filter + element_at(-1), no explode, no shuffle;
    * the whole extraction is a codegen projection.
    */
  def uptimeOf(dialect: Column, blob: Column, now: Column): Column = {
    val first = substring_index(substring_index(trim(blob), " ", 1), ".", 1)
    val linVal = when(first.rlike("^[0-9]+$"), first.cast("bigint"))
    val linux = struct(coalesce(linVal, lit(0L)).as("uptime_s"),
      linVal.isNotNull.as("src_ok"),
      lit(null).cast("boolean").as("boot_found"))
    val boots = filter(split(blob, "\n"),
      l => startswith(l, lit("system boot|")))
    val lastBoot = when(size(boots) > 0, element_at(boots, -1))
    val bootSec = substring_index(lastBoot, "|", -1).cast("bigint")
    val sUp = now.cast("bigint") - coalesce(bootSec, lit(0L))
    val solaris = struct(sUp.as("uptime_s"), (sUp =!= 0L).as("src_ok"),
      (size(boots) > 0).as("boot_found"))
    val none = struct(lit(0L).as("uptime_s"), lit(false).as("src_ok"),
      lit(null).cast("boolean").as("boot_found"))
    when(dialect === "linux", linux)
      .when(dialect === "solaris", solaris)
      .otherwise(none)
  }
}
