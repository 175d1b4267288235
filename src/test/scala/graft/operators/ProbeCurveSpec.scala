package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: the recall-vs-nprobe tuning curve is pinned against the already
  * driver-recomputed `ann_ivf_recall` audit — the curve's nprobe = 2 arm
  * aggregates the SAME tower, probe draw, tie rules and truth side, so its
  * recall must equal the per-probe audit's aggregate exactly. */
class ProbeCurveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("curve arms are monotone and the nprobe=2 arm equals ann_ivf_recall's aggregate") {
    val K = 5
    val curve = AnnQueries.queries("ann_probe_curve").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1, 2, 4))
    // same fixed probe draw in every arm
    assert(curve.map(_._2).distinct.length == 1)
    // more buckets = more scanned pairs and at least as much recall
    assert(curve.map(_._3).toSeq == curve.map(_._3).sorted.toSeq)
    assert(curve.map(_._4).toSeq == curve.map(_._4).sorted.toSeq)
    curve.foreach { case (_, _, _, pm) => assert(pm >= 0 && pm <= 1000) }

    val audit = AnnQueries.queries("ann_ivf_recall").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nProbes = audit.length.toLong
    val expectPm = audit.map(_._2).sum * 1000 / (nProbes * K)
    val arm2 = curve.find(_._1 == 2).get
    assert(arm2._2 == nProbes)
    assert(arm2._4 == expectPm)
  }
}
