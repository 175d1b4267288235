package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: cross-modal pair-integrity audit pinned against a full driver
  * recompute — same tower as CrossModalSpec (seed centroids, argmax
  * assignment first-tie, nprobe pruning) with the sides reversed: every
  * non-text vector probes the TEXT corpus and the audit reports where its
  * canonical partner (quad base vec_id − vec_id % 4) ranks. */
class PairIntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def modality(id: Long): String =
    if (id % 4 == 1) "image" else if (id % 4 == 2) "audio" else "text"

  test("pair-integrity audit matches the driver recompute of partner ranks") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val ids = vecs.map(_._1).toSet
    val k = math.max(8L, vecs.length.toLong / 250)
    val cents = vecs.filter(_._1 < k).sortBy(_._1).map(_._2)
    def nearest(v: Array[Float]): Int =
      cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (c, i) => (c, -i) }._2
    def topClusters(v: Array[Float], n: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .sortBy { case (c, i) => (-c, i) }.take(n).map(_._2)
    val textCorpus = vecs.filter(t => modality(t._1) == "text")
      .map { case (id, v) => (nearest(v), id, v) }
    val byCluster = textCorpus.groupBy(_._1)
    val perPair = vecs.filter(t => modality(t._1) != "text")
      .filter { case (pid, _) => ids(pid - pid % 4) }
      .map { case (pid, pv) =>
        val partnerId = pid - pid % 4
        val scored = topClusters(pv, 2)
          .flatMap(c => byCluster.getOrElse(c, Array.empty[(Int, Long, Array[Float])]))
          .map(e => (e._2, r6(cos(pv, e._3))))
        val prank: Option[Long] = scored.find(_._1 == partnerId).map { case (_, pcos) =>
          1L + scored.count { case (id, c) => c > pcos || (c == pcos && id < partnerId) }
        }
        (modality(pid), prank)
      }
    val expect = perPair.groupBy(_._1).map { case (m, xs) =>
      (m, xs.length.toLong,
        xs.count(_._2.isDefined).toLong,
        xs.count(_._2.contains(1L)).toLong,
        xs.count(_._2.exists(_ <= 5L)).toLong,
        xs.flatMap(_._2).map(1000L / _).sum)
    }.toSeq.sorted
    val got = AnnQueries.queries("mm_pair_integrity").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(got == expect && got.nonEmpty)
    assert(got.map(_._1).toSet == Set("image", "audio"))
    // found can't exceed pairs, hits can't exceed found
    got.foreach { case (_, np, nf, h1, hk, _) =>
      assert(nf <= np && h1 <= hk && hk <= nf)
    }
  }
}
