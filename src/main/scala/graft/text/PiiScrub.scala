package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — mask emails, IPv4 addresses and phone numbers with
  * typed placeholder tokens before the text ships to training (the
  * RefinedWeb-style pre-release pass; it must run BEFORE fingerprinting
  * so two pages differing only in a masked email dedup as the duplicates
  * they are).
  *
  * Scale shape: three chained `regexp_replace` calls — per-row, codegen,
  * zero exchange, rides the scan. Patterns are deliberately restricted to
  * the regex subset Java and RE2 interpret identically (char classes,
  * bounded repetition, `\b`, non-capturing groups — no lookaround, no
  * backreferences), so the DuckDB oracle replays them verbatim.
  *
  * Masking order is part of the contract: emails first (their local part
  * would otherwise shed digit runs into the phone pattern), then IPv4
  * (dotted quads must not half-match as phones), then phones.
  *
  * Reference analog: none — the reference's corpus is local photos;
  * PII release hygiene is what the webtext payload adds (SURVEY §2
  * round-5 deltas, A12).
  */
object PiiScrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  // NNN-NNN-NNNN / NNN.NNN.NNNN and +CC digit runs (8-15 digits, E.164)
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b|\\+\\d{8,15}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** `text` with every email, IPv4 and phone occurrence masked. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Per-row scrub counts — the release-audit columns. Counted on the
    * PRE-scrub text with the same masking-order guards (emails removed
    * before IPs are counted, emails+IPs removed before phones), so the
    * counts equal the number of tokens the scrub minted.
    */
  def counts(text: Column): (Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailPattern, EmailToken)
    val noIp = regexp_replace(noEmail, Ipv4Pattern, IpToken)
    (regexp_count(text, lit(EmailPattern)).cast("long"),
      regexp_count(noEmail, lit(Ipv4Pattern)).cast("long"),
      regexp_count(noIp, lit(PhonePattern)).cast("long"))
  }

  /** Replace `textCol` with its scrubbed form and append the audit
    * counts (`n_emails`, `n_ips`, `n_phones`) — the CLI's `--scrub-pii`
    * step. Per-row, no shuffle, no join-back.
    */
  def scrubPages(df: DataFrame, textCol: String): DataFrame = {
    val (e, i, p) = counts(col(textCol))
    // one projection: counts and the scrub both read the ORIGINAL text
    // (withColumn chaining would count over the already-masked column)
    df.select(df.columns.map(c =>
      if (c == textCol) scrub(col(c)).as(c) else col(c)).toSeq ++
      Seq(e.as("n_emails"), i.as("n_ips"), p.as("n_phones")): _*)
  }
}
