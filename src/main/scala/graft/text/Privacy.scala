package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for web-scale training corpora: the standard
 * pre-release scrub (emails, IPv4 addresses, phone numbers) that runs over
 * every document of a crawl before the text reaches a training mix.
 *
 * Scale design: every operator here is a pure codegen'd `Column` regex
 * expression — zero shuffle, zero UDFs, O(doc length) per row; at 100 TB the
 * scrub is a map-only pass that fuses into whatever scan already reads the
 * text column.
 *
 * Cross-engine contract: the patterns deliberately use only the regex
 * subset shared by Java (Spark) and RE2 (DuckDB oracle) — character
 * classes, bounded repetition, `\b` word boundaries; no lookaround, no
 * backreferences — so the SAME pattern string drives both engines and the
 * redacted text hashes identically.
 */
object Privacy {

  /** Email addresses (pragmatic crawl-scrub pattern, not full RFC 5322). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — scrubs err on recall). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** North-American-style dashed phone numbers (NNN-NNN-NNNN). */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Occurrence counts per PII class as a struct
   * (n_email, n_ipv4, n_phone) — the triage pass that decides whether a
   * document needs the (more expensive) rewrite at all. */
  def piiStats(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ipv4"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long").as("n_phone"))

  /** Replace every PII match with a typed placeholder token. IPv4 runs
   * before phone so a dotted quad is never half-eaten by the phone rule;
   * email runs first so user@host never leaks its host into the IP rule. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Pattern, "<IP>")
    regexp_replace(i, PhonePattern, "<PHONE>")
  }
}
