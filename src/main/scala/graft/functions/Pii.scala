package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction column builders — the scrubbing pre-pass a
  * training-data pipeline runs before anything else sees raw text
  * (emails, phone numbers, IP addresses; the reference stores events
  * verbatim and has no scrub stage — this is pipeline-first surface).
  *
  * The patterns deliberately use only the regex subset with identical
  * semantics in Java's engine (Spark) and RE2 (DuckDB): character
  * classes, bounded quantifiers and alternation — no backrefs, no
  * lookaround — so the declared query's counts hash-match the oracle.
  * Matching is the standard leftmost non-overlapping scan in both.
  *
  * All builders are pure `Column` expressions over Spark's codegen'd
  * regexp kernels: no UDF, whole-stage-codegen-friendly, and the scan
  * cost is one regex automaton pass per pattern per document.
  */
object Pii {

  /** local@domain.tld — conservative: requires a dotted TLD. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 555-123-4567 (and 3-3-4/3-4-4 shapes). */
  val phonePat = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  /** Dotted-quad IPv4 (no octet-range validation — a scrubber prefers
    * false positives over leaks). */
  val ipv4Pat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private val pats = Seq("email" -> emailPat, "phone" -> phonePat,
    "ipv4" -> ipv4Pat)

  /** Number of matches of `pat` in `text`. */
  def count(text: Column, pat: String): Column =
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")

  /** Total characters covered by matches of `pat` (the redaction
    * byte-accounting an audit wants: how much text the scrub removed).
    * Spelled as length(text) − length(text with matches removed) —
    * exactly the character mass of the leftmost non-overlapping match
    * set, identical to summing match lengths — because the obvious
    * aggregate(transform(regexp_extract_all(...))) spelling uses
    * higher-order functions, which have NO codegen path and drop the
    * whole enclosing projection to interpreted Expression.eval (the
    * Shingles.scala lesson; measured on x_pii_scrub in r19: the six
    * regex kernels of its one-pass projection all fell out of
    * whole-stage codegen). */
  def matchedChars(text: Column, pat: String): Column =
    coalesce((length(text) - length(regexp_replace(text, lit(pat), lit(""))))
      .cast("long"), lit(0L))

  /** `text` with every email/phone/IPv4 replaced by its type tag —
    * applied in pattern order; order only matters for overlapping
    * hits, where earlier patterns win (email before ipv4 keeps
    * user@1.2.3.4 an email). */
  def scrub(text: Column): Column =
    pats.foldLeft(text) { case (c, (tag, p)) =>
      regexp_replace(c, p, s"<$tag>")
    }
}
