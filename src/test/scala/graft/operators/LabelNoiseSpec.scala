package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** k-NN label-noise audit pinned against a full driver recompute of the
  * cluster pruning, the top-k neighbor selection, and the minority vote. */
class LabelNoiseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("flagged set matches the driver recompute (k scaled by corpus)") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    // the k ∝ corpus rule: expected occupancy pinned at 250, floor 8
    val k = math.max(8L, vecs.length.toLong / 250)
    val cents = vecs.filter(_._1 < k).sortBy(_._1).map(_._2)
    assert(k == 8) // 500 vectors at sf0.001: the floor governs
    val assigned = vecs.map { case (id, v, l) =>
      val cl = cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (c, i) => (c, -i) }._2
      (cl, id, v, l)
    }
    val byCluster = assigned.groupBy(_._1)
    val expect = assigned.flatMap { case (cl, id, v, l) =>
      val nbrs = byCluster(cl).filter(_._2 != id)
        .map(n => (r6(cos(v, n._3)), n._2, n._4))
        .sortBy(t => (-t._1, t._2)).take(5)
      val agree = nbrs.count(_._3 == l).toLong
      if (agree * 2 < nbrs.length) Some((id, l, nbrs.length.toLong, agree)) else None
    }.toSeq.sortBy(_._1)
    val got = AnnQueries.queries("ann_label_noise").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // flagged means strict minority by definition
    assert(got.forall(t => t._4 * 2 < t._3))
  }
}
