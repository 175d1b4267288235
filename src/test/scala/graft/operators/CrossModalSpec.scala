package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cross-modal IVF retrieval pinned against a full driver recompute of
  * the tower: seed centroids, argmax assignment (first index on ties),
  * nprobe probe pruning, non-text corpus filter, round-6 cosine ranking
  * with the family tie rule. */
class CrossModalSpec extends AnyFunSuite {
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

  test("cross-modal top-k matches the driver recompute of the shared tower") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val k = math.max(8L, vecs.length.toLong / 250)
    val cents = vecs.filter(_._1 < k).sortBy(_._1).map(_._2)
    def nearest(v: Array[Float]): Int =
      cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (c, i) => (c, -i) }._2
    def topClusters(v: Array[Float], n: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .sortBy { case (c, i) => (-c, i) }.take(n).map(_._2)
    val corpus = vecs.filter(t => modality(t._1) != "text")
      .map { case (id, v) => (nearest(v), id, v) }
    val byCluster = corpus.groupBy(_._1)
    val expect = vecs
      .filter(t => t._1 % 50 == 0 && modality(t._1) == "text")
      .flatMap { case (pid, pv) =>
        val elig = topClusters(pv, 2).flatMap(c => byCluster.getOrElse(c, Array.empty[(Int, Long, Array[Float])]))
          .filter(_._2 != pid)
        elig.map(e => (pid, e._2, r6(cos(pv, e._3))))
          .sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((p, id, c), i) => (p, i + 1L, id, modality(id), c) }
      }.toSeq.sorted
    val got = AnnQueries.queries("mm_ann_crossmodal").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // every retrieved vector is image/audio, never text
    assert(got.forall(t => t._4 == "image" || t._4 == "audio"))
    // every probe is text-modality from the family probe set
    assert(got.forall(t => t._1 % 50 == 0 && modality(t._1) == "text"))
  }
}
