package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Two-level coarse assignment pinned against a full driver recompute:
  * flat argmax over 16 centroids vs representative-then-group routing,
  * with the family tie rules at both levels. */
class TwoLevelAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("per-cluster occupancy table matches the driver two-level recompute") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val cents = vecs.filter(_._1 < 16).sortBy(_._1).map(_._2)
    val reps = (0 until 4).map(g => cents(g * 4))
    def argmax(v: Array[Float], cs: Seq[Array[Float]]): Int =
      cs.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (c, i) => (c, -i) }._2
    val assigned = vecs.map { case (_, v) =>
      val flat = argmax(v, cents.toSeq)
      val g = argmax(v, reps)
      val two = g * 4 + argmax(v, cents.slice(g * 4, g * 4 + 4).toSeq)
      (flat, two)
    }
    val expect = (0 until 16).map { c =>
      val nf = assigned.count(_._1 == c).toLong
      val nt = assigned.count(_._2 == c).toLong
      val na = assigned.count(t => t._1 == c && t._2 == c).toLong
      (c.toLong, nf, nt, na, if (nf > 0) na * 1000 / nf else 0L)
    }.filter(t => t._2 > 0 || t._3 > 0)
    val got = AnnQueries.queries("ann_twolevel_assign").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // structural identities: both routings partition the corpus, and
    // agreement never exceeds either side's occupancy. (The agreement
    // LEVEL is data-dependent — measuring it is the audit's whole job —
    // so it is reported, not asserted: on this synthetic corpus the
    // seed-id groups are arbitrary and agreement sits near 47%.)
    val total = vecs.length.toLong
    assert(got.map(_._2).sum == total && got.map(_._3).sum == total)
    got.foreach(t => assert(t._4 <= math.min(t._2, t._3)))
  }
}
