package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (SURVEY §2.3 §31-34).
  *
  * Everything is built from codegen'd built-ins (split/transform/aggregate/
  * md5) — no UDFs — so the whole text pipeline stays inside whole-stage
  * codegen and needs zero shuffles until an explicit aggregation.
  *
  * Hashing is md5-hex based: md5 is bit-identical across engines, which is
  * what makes the minhash/fingerprint family reproducible in the DuckDB
  * oracle (and on any other engine a 100 TB corpus pipeline might span).
  */
object TextFunctions {

  /** Whitespace tokens; empty tokens dropped (Spark `trim` strips only
    * spaces, so a trailing tab/newline would otherwise leave a phantom ""
    * token that pollutes shingles and counts). */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Word n-gram shingles (default 3); whole text if shorter than n. */
  def shingles(wordsCol: String, n: Int = 3): Column = expr(
    s"""CASE WHEN size($wordsCol) >= $n
       |THEN transform(sequence(0, size($wordsCol) - $n),
       |     i -> concat_ws(' ', ${(0 until n).map(k => s"$wordsCol[i + $k]").mkString(", ")}))
       |ELSE array(concat_ws(' ', $wordsCol)) END""".stripMargin)

  /** Winnowing-style document fingerprint: lexicographic min of shingle
    * md5s — one stable 32-hex-char id per document. */
  def fingerprint(shinglesCol: Column): Column =
    array_min(transform(shinglesCol, s => md5(s)))

  /** Seeded minhash component: min over shingles of md5("<seed>:<shingle>").
    * The md5-hex min is a proper minwise hash (uniform over shingles) and
    * is engine-portable, unlike murmur3 variants. */
  def minhash(shinglesCol: Column, seed: Column): Column =
    array_min(transform(shinglesCol, s => md5(concat(seed.cast("string"), lit(":"), s))))

  /** Count of tokens that appear in `stopwords`. */
  def stopwordCount(wordsCol: Column, stopwords: Seq[String]): Column =
    size(filter(wordsCol, w => w.isin(stopwords: _*)))

  // ----------------------------------------------------- PII redaction

  /** PII patterns redacted before a corpus ships to training — the
    * C4/RefinedWeb-style hygiene pass: emails, IPv4 addresses, dashed
    * phone-shaped numbers. Ordered: each class is (pattern, placeholder),
    * applied in sequence (email first, so its dotted host is consumed
    * before the IP pattern can bite a lookalike). Anchored to word
    * boundaries where the class allows it; deliberately conservative —
    * a corpus scrub prefers missed borderline strings over destroying
    * ordinary prose (the same trade every published scrub makes). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "[IP]",
    "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b" -> "[PHONE]")

  /** Redacted text: every PII class replaced by its placeholder. Pure
    * chained `regexp_replace` — codegen'd, row-local, zero shuffle. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-class PII hit counts as a struct (email_hits, ip_hits,
    * phone_hits) — the audit side of [[redactPii]]: a scrub without a
    * count report can't prove it ran. Counted on the SAME sequentially
    * redacted text as the replacement pass, so classes never double-count
    * one substring (an email's dotted host is not also an IP). */
  def piiCounts(text: Column): Column = {
    val (struct_, _) = piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, cur), (pat, repl)) =>
        val hits = size(regexp_extract_all(cur, lit(pat), lit(0)))
        (acc :+ hits, regexp_replace(cur, pat, repl))
    }
    struct(
      struct_(0).as("email_hits"),
      struct_(1).as("ip_hits"),
      struct_(2).as("phone_hits"))
  }
}
