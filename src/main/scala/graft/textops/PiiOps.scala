package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for web-corpus curation (the pre-training scrub every
  * public pipeline runs: mask emails and bare IPv4 addresses before
  * the text is tokenized).
  *
  * The patterns are kept inside the Java-regex ∩ RE2 common subset —
  * character classes, bounded repetition and ASCII `\b` word
  * boundaries only; no backreferences, no lookaround — so the IDENTICAL
  * pattern string runs in Spark (java.util.regex) and in the DuckDB
  * oracle (RE2) with the same leftmost non-overlapping match semantics.
  * Replacement is global on both sides (Spark's regexp_replace default;
  * RE2 needs the explicit 'g' flag — the oracle SQL carries it).
  */
object PiiOps {

  /** Email: local part, '@', dotted domain, >=2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Bare IPv4: four 1-3 digit octets, word-bounded so longer digit
    * runs and version strings don't half-match. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redacted copy of `text`: emails then IPv4s masked. Email first —
    * an email's domain may otherwise leave a dotted tail the IP rule
    * could clip. Pure codegen'd regexp_replace, no UDF. */
  def redact(text: Column, emailTag: String = "<EMAIL>",
             ipTag: String = "<IP>"): Column =
    regexp_replace(regexp_replace(text, EmailRe, emailTag), Ipv4Re, ipTag)

  /** Count of email matches in `text` (non-overlapping, leftmost). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))

  /** Count of bare-IPv4 matches in `text`. */
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
}
