package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (builder brief:
  * text-analysis family — no reference counterpart; every public corpus
  * pipeline scrubs emails/phones/IPs before training).
  *
  * Pure map-side codegen'd builtins (`regexp_count`/`regexp_replace`) —
  * no UDF, no shuffle; at 100 TB this is embarrassingly parallel scan
  * work that rides whatever partitioning the scan already has.
  *
  * The patterns deliberately stay inside the Java-regex ∩ RE2 common
  * subset (character classes, bounded repeats, `(?:…)`, `\b`) so the
  * DuckDB oracle replays them VERBATIM — the cross-engine hash compare
  * in q98 then proves the redaction semantics, not just the plumbing.
  * Redaction order is part of the operator contract: emails, then IPv4,
  * then phones (emails first so a dotted domain can never be half-eaten
  * by the IPv4 pass once real-world domains contain digits).
  */
object Pii {

  /** Practical email shape (local@domain.tld); `-` last in the class so
    * it stays literal in both dialects.
    */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style `NXX-NXX-XXXX` with word boundaries. */
  val phoneRe: String = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no octet-range check, matching what
    * corpus scrubbers actually deploy).
    */
  val ipv4Re: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Re))

  /** Replace every PII span with a typed placeholder, fixed pass order
    * (email → ip → phone).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** The oracle-side replay of [[redact]] for DuckDB (RE2): identical
    * patterns, identical order, `'g'` flag because DuckDB's
    * `regexp_replace` is first-match-only by default while Spark's is
    * global.
    */
  def redactSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($expr, '$emailRe', '<EMAIL>', 'g'), '$ipv4Re', '<IP>', 'g'), '$phoneRe', '<PHONE>', 'g')"
}
