package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Dataset card pinned against a driver recompute of the volume stats,
  * duplicate pressure, and the micro-nat language-entropy lane. */
class DatasetCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def micro(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("card rows match the driver recompute") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expect = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val n = ds.length.toLong
      val toks = ds.map(_._4.split("\\s+").count(_.nonEmpty).toLong).sum
      val chars = ds.map(_._3).sum
      val distinct = ds.map(d => md5hex(d._4)).distinct.length.toLong
      val ent = ds.groupBy(_._2).values.map { ls =>
        val p = ls.size.toDouble / n
        micro(-p * math.log(p) * 1000000)
      }.sum
      (src, n, toks, chars, toks * 1000 / n, (n - distinct) * 1000 / n, ent)
    }.sortBy(_._1)
    val got = CorpusQueries.datasetCard(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // entropy bounded by ln(#langs) in micro-nats (5 langs → ~1.609e6)
    assert(got.forall(t => t._7 >= 0 && t._7 <= 1700000))
  }
}
