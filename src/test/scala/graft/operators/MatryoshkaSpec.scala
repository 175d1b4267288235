package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: Matryoshka prefix-dim audit + truncate-then-refine retrieval
  * pinned against full driver recomputes — the same salted-md5 audit
  * probe draw, the same r6 cosine, the same (cos desc, vec_id) tie-break
  * as the queries and their DuckDB oracles. */
class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 5
  private val CandK = 4 * K
  private val ProbeMod = 50
  private val Budget = 40
  private val Salt = "graft-ann-audit:"

  private def dot(a: Array[Float], b: Array[Float], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cosN(a: Array[Float], b: Array[Float], n: Int): Double =
    dot(a, b, n) / (math.sqrt(dot(a, a, n)) * math.sqrt(dot(b, b, n)))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    .select("vec_id", "embedding")
    .as[(Long, Array[Float])].collect().sortBy(_._1)
  private lazy val dim = vecs.head._2.length

  private def auditProbes: Array[(Long, Array[Float])] =
    vecs.filter(_._1 % ProbeMod == 0)
      .sortBy { case (id, _) => (md5hex(Salt + id.toString), id) }
      .take(Budget)

  private def topkIds(probe: (Long, Array[Float]), n: Int, k: Int): Seq[Long] =
    vecs.filter(_._1 != probe._1)
      .map { case (id, v) => (id, r6(cosN(v, probe._2, n))) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq

  test("matryoshka recall audit matches the driver recompute") {
    val expect = (for {
      d <- Seq(dim / 4, dim / 2)
      p <- auditProbes
    } yield {
      val truth = topkIds(p, dim, K).toSet
      val pfx = topkIds(p, d, K).toSet
      val ov = (truth & pfx).size.toLong
      (d, p._1, ov, ov * 1000 / K)
    }).sorted
    val got = AnnQueries.queries("ann_matryoshka_recall").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    got.foreach { case (_, _, ov, pm) =>
      assert(ov >= 0 && ov <= K && pm >= 0 && pm <= 1000)
    }
  }

  test("truncate-then-refine matches the driver recompute") {
    val probes = vecs.filter(_._1 % ProbeMod == 0)
    val expect = probes.flatMap { p =>
      val cands = topkIds(p, dim / 4, CandK)
      val byId = vecs.toMap
      cands.map(id => (id, r6(cosN(byId(id), p._2, dim))))
        .sortBy { case (id, c) => (-c, id) }.take(K).zipWithIndex
        .map { case ((id, c), i) => (p._1, (i + 1).toLong, id, c) }
    }.toSeq.sorted
    val got = AnnQueries.queries("ann_matryoshka_refine").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // every probe reports exactly k refined rows
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (1L to K.toLong))
    }
  }
}
