package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-slice centroid drift: pinned against a full driver
  * recompute of the µ-quantized integer sum vectors, exact BigInt
  * dot/norm folds, and the documented float chain.
  */
class CentroidDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("centroid drift matches the integer sum-vector recompute") {
    val vecs: Array[(Int, Array[Long])] = graft.sources.Tables(dir)(spark).embeddings
      .selectExpr("label", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        (r.getInt(0), e.map(x =>
          BigDecimal(x.toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      }
    val dim = vecs.head._2.length
    val byLabel = vecs.groupBy(_._1)
    val sums: Map[Int, Array[BigInt]] = byLabel.view.mapValues { vs =>
      Array.tabulate(dim)(i => vs.map(v => BigInt(v._2(i))).sum)
    }.toMap
    val g = Array.tabulate(dim)(i => sums.values.map(_(i)).sum)
    val normg = g.map(x => x * x).sum
    val expect = byLabel.toSeq.map { case (lab, vs) =>
      val s = sums(lab)
      val dot = (0 until dim).map(i => s(i) * g(i)).sum
      val norml = s.map(x => x * x).sum
      val ssq = vs.flatMap(_._2).map(x => BigInt(x) * x).sum
      val cos = r6(dot.toDouble / math.sqrt(norml.toDouble) / math.sqrt(normg.toDouble))
      (lab, vs.length.toLong, cos, r6(ssq.toDouble / vs.length / 1e12), cos < 0.98)
    }.sortBy(_._1)
    val got = AnnQueries.queries("ann_centroid_drift").fn(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // cosine against a vector that includes the slice itself: bounded above by 1
    got.foreach { case (_, _, cos, msn, _) => assert(cos <= 1.0 && msn > 0) }
  }
}
