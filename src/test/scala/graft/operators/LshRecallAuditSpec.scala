package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: the MinHash-LSH recall/precision audit pinned two ways — the exact
  * truth side against a full plain-Scala shingle-Jaccard recompute, and the
  * candidate side against the already-oracled `dedup_minhash_lsh` pair set
  * restricted to anchor-touching pairs (the audit's stated identity). */
class LshRecallAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Tau = 0.5
  private val Budget = 40
  private val Salt = "graft-dedup-audit:"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("audit counts match the driver recompute and the registered candidate set") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val anchors = docs.map(_._1)
      .sortBy(id => (md5hex(Salt + id.toString), id)).take(Budget).toSet
    val sets = docs.map { case (id, text) =>
      val w = text.split("\\s+").filter(_.nonEmpty)
      val sh =
        if (w.length >= 3) (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
        else Set(w.mkString(" "))
      id -> sh
    }.toMap
    val exact = (for {
      a <- anchors.toSeq
      (b, sb) <- sets if b != a
      sa = sets(a)
      inter = (sa & sb).size
      if inter > 0 && r6(inter.toDouble / (sa.size + sb.size - inter)) >= Tau
    } yield (math.min(a, b), math.max(a, b))).toSet

    val lshPairs = DedupQueries.queries("dedup_minhash_lsh").fn(spark, TestSpark.Sf0001)
      .as[(Long, Long)].collect().toSet
    val cand = lshPairs.filter { case (x, y) => anchors(x) || anchors(y) }
    val found = exact & cand

    val got = DedupQueries.queries("dedup_lsh_recall").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 1)
    val (nExact, nCand, nFound, recallPm, precisionPm) = got.head
    assert(nExact == exact.size.toLong)
    assert(nCand == cand.size.toLong)
    assert(nFound == found.size.toLong)
    assert(recallPm == nFound * 1000 / math.max(nExact, 1L))
    assert(precisionPm == nFound * 1000 / math.max(nCand, 1L))
    assert(nExact > 0)
  }
}
