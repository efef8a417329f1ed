package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data pipeline operators.
  * All are pure Column expressions (codegen'd built-ins), so the
  * shingling/normalization pipeline stays inside whole-stage codegen
  * and pushes through the parquet scan untouched.
  */
object TextOps {

  /** Canonical normalization: lowercase, collapse whitespace, trim.
    * Mirrored exactly by the DuckDB oracle
    * (`trim(regexp_replace(lower(text),'\s+',' ','g'))`).
    */
  def norm(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(norm(text), " ")

  /** Distinct word n-gram shingles: `concat_ws(" ", ts[i..i+n-1])`.
    * Caller must filter `size(tokens) >= n` (sequence() would run
    * backwards on shorter docs).
    */
  def shingles(ts: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(ts) - (n - 1)),
      i => concat_ws(" ", slice(ts, i, lit(n)))))

  /** GPT-2-style pretokenizer pattern, simplified to the classes this
    * corpus can contain (lowercased input): a token is an optionally
    * space-prefixed run of letters, digits, or other non-space
    * symbols, or a whitespace run. Alternation is leftmost-first in
    * both Java regex and DuckDB's RE2, so the count is engine-portable
    * and the oracle shares this exact string. Canonical copy lives
    * with the BPE vocabulary ([[graft.functions.BpeVocab]]) — the
    * pretokenizer and the merge table version together.
    */
  val bpePattern: String = graft.functions.BpeVocab.pretokenPattern

  /** Stopword list shared with the oracle SQL (quality scoring). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "that", "for", "on")

  /** Count of tokens that are stopwords. */
  def stopwordCount(ts: Column): Column =
    size(filter(ts, t => t.isInCollection(stopwords)))

  /** Punctuation (non-alphanumeric, non-space) character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
}
