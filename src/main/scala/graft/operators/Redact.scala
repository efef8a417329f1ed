package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII redaction — the scrubbing pass every public-corpus curation
  * stack runs before training (the C4 recipe strips pages on a
  * blocklist; production pipelines additionally REDACT structured
  * identifiers in kept text — emails, phone numbers, IP addresses —
  * replacing each with a type token so the text stays trainable).
  *
  * Pure codegen'd `regexp_replace`/`regexp_extract_all` projections
  * on the scan — no shuffle, no UDF, linear in corpus bytes, exactly
  * the shape that runs at 100 TB as a map-only stage. The patterns
  * deliberately use only the regex subset Java's engine and RE2
  * (DuckDB) interpret identically — character classes, bounded
  * quantifiers, ASCII `\b` — no backrefs or lookarounds, so the
  * driver gate hash-checks every replacement byte cross-engine.
  *
  * Replacement order is fixed (email, phone, IPv4) and SEMANTIC, not
  * convention: identifier-like strings can nest (a NANP phone is a
  * valid email local part — "555-123-4567@x.co" — and a dotted quad
  * can sit in an email's domain), so the email pass claims composites
  * first and the digit-shaped passes see only what survives. The
  * oracle pins the same order; reordering changes output bytes.
  */
object Redact {

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val EmailTok = "[EMAIL]"
  val PhoneTok = "[PHONE]"
  val Ipv4Tok = "[IP]"

  /** The redacted text column. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTok),
        PhoneRe, PhoneTok),
      Ipv4Re, Ipv4Tok)

  /** Per-kind match counts + the redacted text over any text column.
    *
    * Counts are RAW-TEXT matches, not replacement counts: replacement
    * is sequential email-first, so an identifier nested inside an
    * earlier kind's match (a NANP phone as an email local part —
    * "555-123-4567@x.co" — or a dotted quad in an email domain) is
    * counted under its own kind but replaced as part of the [EMAIL]
    * token. The audit fields answer "how much PII-shaped text did the
    * corpus carry", which is stable under reordering; per-kind bytes-
    * replaced would need the counts re-derived after each preceding
    * pass. The oracle pins the same raw-text semantics.
    */
  def redactWithCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("bigint"))
      .withColumn("n_phones",
        size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("bigint"))
      .withColumn("n_ips",
        size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("bigint"))
      .withColumn("redacted", redact(text))

  /** Driver-gate surface: the synthetic corpus carries no natural
    * PII, so the gate PLANTS it deterministically (the twin-planting
    * discipline): docs ≡ 0 (mod 4) append an id-derived email,
    * ≡ 1 a NANP-shaped phone, ≡ 2 a dotted-quad IP, ≡ 3 stay clean —
    * id-derived digits so every planted value is unique and the
    * oracle rebuilds the identical pre-redaction text. Output pins
    * the counts and the md5 of the redacted text (every replacement
    * byte, not just totals).
    */
  /** The deterministic PII plant (ONE copy, shared by the standalone
    * gate and the full-pipeline composition so the planted bytes can
    * never drift between them): docs ≡ 0 (mod 4) get an id-derived
    * email, ≡ 1 a NANP phone, ≡ 2 a dotted-quad IP, ≡ 3 nothing.
    */
  def plantedPii(did: Column): Column =
    when(did % 4 === 0,
        concat(lit(" contact user"), did.cast("string"), lit("@example.com now")))
      .when(did % 4 === 1,
        concat(lit(" call 555-"), lpad((did % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((did * 7) % 10000).cast("string"), 4, "0"),
          lit(" today")))
      .when(did % 4 === 2,
        concat(lit(" from 10."), (did % 256).cast("string"),
          lit("."), ((did * 3) % 256).cast("string"),
          lit("."), ((did * 7) % 256).cast("string"), lit(" logged")))
      .otherwise(lit(""))

  def redactGate(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"), plantedPii(col("doc_id"))).as("raw"))
    redactWithCounts(raw, col("raw"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("redacted")).as("fp"))
      .orderBy("doc_id")
  }
}
