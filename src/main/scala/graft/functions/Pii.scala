package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus scrubbing — the standard
  * pre-training hygiene pass (emails, IP addresses, phone-shaped numbers →
  * typed placeholder tokens, plus per-document match counts for filtering
  * and reporting).
  *
  * Patterns are deliberately written in the Java∩RE2 regex subset — no
  * backreferences, no lookaround, ASCII classes only — so the SAME pattern
  * string runs under Spark (java.util.regex) and any RE2-based engine
  * (DuckDB, Go) with identical matches; both use leftmost, non-overlapping
  * scanning. All ops are codegen'd string expressions: linear per-row work,
  * no UDFs, no shuffle — the pass pipelines into whatever scan precedes it.
  *
  * These are pattern heuristics, not NER: they catch well-formed
  * identifiers, not names or free-text addresses (documented limitation of
  * regex-level scrubbing).
  */
object Pii {

  /** user@host.tld (conservative: requires an alphabetic TLD of 2+). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: octet range not enforced — 999.0.0.1
    * matches; redacting a non-address is the safe failure mode). */
  val ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** North-American-style phone: optional +1/1 prefix, 3-3-4 groups with
    * - or space separators. The prefix is an alternation, not `\b\+?…`:
    * `\b` never matches before `+` (two non-word chars), which would leave
    * the plus behind on redaction. */
  val phonePattern = "(\\+1[- ]|\\b1[- ])?\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(ipv4Pattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phonePattern))

  /** Replace every match with a typed placeholder. Order matters and is
    * fixed: emails first (an email's host can contain a dotted quad), then
    * IPs, then phones — applying the same order is part of the cross-engine
    * contract. */
  def redact(c: Column,
      email: String = "<EMAIL>", ip: String = "<IP>",
      phone: String = "<PHONE>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, email),
        ipv4Pattern, ip),
      phonePattern, phone)
}
