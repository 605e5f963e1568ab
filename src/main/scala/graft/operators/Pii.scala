package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a corpus goes through
  * before training (emails, phone numbers, IP addresses, card-shaped
  * digit runs masked to typed placeholder tokens, cf. the redaction
  * step in public corpus pipelines such as Dolma and BigCode's
  * StarCoder data).
  *
  * Pure per-row `regexp_replace` / `regexp_count` projections: columns
  * prune to (doc_id, text), nothing shuffles, everything stays inside
  * whole-stage codegen — the operator costs one scan at any corpus
  * size. Patterns deliberately use only the regex subset with
  * identical semantics in Java (Spark) and RE2 (the DuckDB oracle):
  * character classes, bounded repetition, non-capturing groups, `\b` —
  * no backreferences or lookaround.
  *
  * Masking order matters and is fixed: card-shaped runs are masked
  * BEFORE phone-shaped ones (a 16-digit card contains phone-shaped
  * substrings), and emails before anything else (an email's local part
  * may contain digit runs).
  */
object Pii {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CardRe  = "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[ .-]\\d{3}[ .-]\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII counts plus the redacted text. Cascade
    * semantics: each stage counts AND masks on the output of the
    * previous stage, so a digit run inside an already-masked email is
    * never double-counted as a phone number.
    *
    * Pure projection with NO required ordering — works unchanged on a
    * STREAMING DataFrame (the continuous-ingest scrub). [[redact]] is
    * the batch/oracle form that adds the deterministic output order. */
  def scrub(docs: DataFrame): DataFrame = {
    val t0 = col("text")
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, CardRe, "<CARD>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    val redacted = regexp_replace(t3, Ipv4Re, "<IP>")
    val nEmail = regexp_count(t0, lit(EmailRe))
    val nCard  = regexp_count(t1, lit(CardRe))
    val nPhone = regexp_count(t2, lit(PhoneRe))
    val nIp    = regexp_count(t3, lit(Ipv4Re))
    docs.select(
      col("doc_id"),
      nEmail.cast("long").as("n_emails"),
      nCard.cast("long").as("n_cards"),
      nPhone.cast("long").as("n_phones"),
      nIp.cast("long").as("n_ips"),
      (nEmail + nCard + nPhone + nIp === 0).as("pii_free"),
      redacted.as("redacted"))
  }

  /** "No PII anywhere" as a raw Column over `text`, for single-scan
    * composites. Equivalent to [[scrub]]'s cascaded `pii_free`: when
    * every cascaded count is zero each intermediate text equals the
    * raw text, and vice versa — so zero-detection needs no cascade. */
  def piiFreeCol: org.apache.spark.sql.Column =
    regexp_count(col("text"), lit(EmailRe)) === 0 &&
      regexp_count(col("text"), lit(CardRe)) === 0 &&
      regexp_count(col("text"), lit(PhoneRe)) === 0 &&
      regexp_count(col("text"), lit(Ipv4Re)) === 0

  /** [[scrub]] with the deterministic doc_id output order (batch).
    * SORT-FIRST via [[graft.operators.Dedup.orderedSpread]]: ordering
    * the narrow input and projecting after the exchange runs the
    * regex cascade exactly once, in parallel — projecting first would
    * evaluate it twice (the range partitioner's sampling pass
    * executes the exchange's input plan, then the real pass does) and
    * shuffle the redacted copies instead of the raw rows. A map-side
    * projection preserves the sort order, so the contract is
    * unchanged. */
  def redact(docs: DataFrame): DataFrame =
    scrub(graft.operators.Dedup.orderedSpread(docs, "doc_id"))
}
