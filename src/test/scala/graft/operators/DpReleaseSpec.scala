package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: ε = ln 2 geometric-mechanism release pinned against a full driver
  * recompute — same salted md5 seed, same leading-1-bits magnitudes, same
  * noisy-count publication threshold. */
class DpReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Salt = "graft-dp-v1:"
  private val ReleaseMin = 10L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Leading 1-bits of a 16-bit value (bit 15 downwards). */
  private def leadingOnes(u: Int): Int = {
    var m = 0
    while (m < 16 && ((u >> (15 - m)) & 1) == 1) m += 1
    m
  }

  private def noise(lang: String, source: String): Long = {
    val m = md5hex(Salt + lang + "|" + source)
    val u1 = Integer.parseInt(m.substring(0, 4), 16)
    val u2 = Integer.parseInt(m.substring(4, 8), 16)
    (leadingOnes(u1) - leadingOnes(u2)).toLong
  }

  test("dp release matches the driver recompute and suppresses sub-threshold cells") {
    val cells = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("lang", "source").as[(String, String)].collect()
      .groupBy(identity).map { case ((l, s), xs) => (l, s, xs.length.toLong) }
    val expect = cells
      .map { case (l, s, n) => (l, s, n + noise(l, s)) }
      .filter(_._3 >= ReleaseMin).toSeq.sorted
    val got = TextQueries.queries("docs_dp_release").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // released counts sit within the mechanism's hard envelope of the true
    // counts (|noise| ≤ 16 by construction) and are all ≥ the threshold
    val trueBy = cells.map { case (l, s, n) => (l, s) -> n }.toMap
    got.foreach { case (l, s, rel) =>
      assert(rel >= ReleaseMin)
      assert(math.abs(rel - trueBy((l, s))) <= 16)
    }
    // some suppression actually happened at this scale (cells exist below
    // the threshold), so the filter is exercised, not vacuous
    assert(got.size < cells.size)
  }
}
