package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data curation.
  *
  * A 100 TB pretraining corpus is scrubbed of contact information
  * before anything else touches it (the reference's domain — uploaded
  * user documents — makes this mandatory, cf. Server2 upload path
  * `main.py` /upload-document: raw user files land verbatim in the
  * store). The patterns below are deliberately restricted to the
  * Java∩RE2 regex subset (no backreferences, no lookaround, no \b,
  * no possessive quantifiers) so the *identical* pattern string runs
  * under Spark's java.util.regex and the DuckDB oracle's RE2 with the
  * same match semantics — the same trick `TextAnalysis.BpeishPattern`
  * uses for `t_bpe_tokens`.
  *
  * Everything here is a narrow per-row projection: no shuffle, no
  * UDF, whole-stage-codegen'd `regexp_replace`/`regexp_extract_all`.
  * At 100 TB this runs at scan speed and is the cheapest possible
  * shape for a full-corpus rewrite.
  */
object Pii {

  /** local-part@domain.tld — the common-subset email shape. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International phone: +CC-AAA(-BBBB)-NNNN with `-` separators.
    * Segment-count bounded so it never swallows adjacent numerics. */
  val PhonePattern: String = "\\+[0-9]{1,3}-[0-9]{1,4}-[0-9]{3,4}-[0-9]{4}"

  /** IPv4 dotted quad. Octet-range validation (0-255) is NOT encoded —
    * over-redaction of an impossible quad like 999.1.1.1 is the safe
    * failure mode for a scrubber. */
  val Ipv4Pattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken    = "<IP>"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long")

  /** Replace every PII span with its type token. Order matters: emails
    * first, so a phone- or IP-shaped substring inside an email's local
    * part (the local charset admits `+`, `-`, `.` and digits —
    * `+82-2-555-1234@example.com`, `a.1.2.3.4b@example.com`) is
    * consumed whole as `<EMAIL>` rather than partially rewritten as
    * `<PHONE>@example.com` / `a.<IP>b@example.com`; then phones, then
    * bare IPs. Note numeric-HOST addresses (`user@1.2.3.4`) never match
    * EmailPattern (the TLD must be alphabetic) and intentionally fall
    * through to `user@<IP>`. Spark `regexp_replace` is replace-all by
    * default; the DuckDB oracle must pass the 'g' flag for parity. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, EmailToken)
    val noPhone = regexp_replace(noEmail, PhonePattern, PhoneToken)
    regexp_replace(noPhone, Ipv4Pattern, IpToken)
  }

  /** Detection + redaction in one projection: adds `n_emails`,
    * `n_phones`, `n_ips`, `has_pii`, and `redacted` next to the
    * original column. */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", emailCount(t))
      .withColumn("n_phones", phoneCount(t))
      .withColumn("n_ips", ipCount(t))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
      .withColumn("redacted", redact(t))
  }
}
