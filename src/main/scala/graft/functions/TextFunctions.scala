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
}
