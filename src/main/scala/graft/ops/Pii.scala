package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the C4/FineWeb-style scrub that replaces personally
  * identifying substrings with typed placeholder tokens before a corpus
  * ships to training. Three detector classes, each a single regex over
  * engine-portable syntax (character classes, bounded repetition,
  * non-capturing groups, `\b` — the common subset of Java regex and RE2,
  * so the SAME pattern strings drive Spark's codegen `regexp_replace`/
  * `regexp_count` AND the DuckDB value oracle):
  *
  *   - email:  `local@domain.tld` (RFC-liberal local part)
  *   - IPv4:   four dotted 1-3 digit octets at word boundaries
  *   - phone:  `+CC NNN NNN NNNN`-shaped international numbers
  *             (separator ` ` or `-`; rigid shape on purpose — a greedy
  *             free-form digit-run pattern differs across regex engines
  *             on overlap, a fixed shape cannot)
  *
  * Redaction order is part of the spec (email → ip → phone): an email's
  * domain can contain digit runs, so emails are consumed first and the
  * later patterns see only the placeholder. Counts are taken BEFORE any
  * replacement, each against the original text, so they report what was
  * found, not what survived earlier passes.
  *
  * Scale shape: one map-only projection — no shuffle, no UDF; all three
  * passes fuse into the same whole-stage-codegen stage as the scan, and
  * column pruning reaches the reader.
  */
object Pii {

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** portable subset: no lookaround, no backrefs (RE2 has neither) */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern: String = "\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}"

  /** the redacted text column (email → ip → phone, see object doc) */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Redact `textCol` and report per-class hit counts.
    * Returns (idCol, red_text, n_emails, n_ips, n_phones) — counts as
    * BIGINT against the ORIGINAL text (order-independent, exact).
    */
  def redact(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      redactText(col(textCol)).as("red_text"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("n_phones"))
}
