package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Offline changepoint pinned against a driver recompute of the daily
  * cells, the cumulative sufficient sums, and the variance-reduction
  * gain — plus the SSE ground truth: the flagged split must be the one
  * that minimizes total within-segment SSE over all candidate splits. */
class ChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val daily: Seq[(Long, Long)] =
    graft.sources.Tables(dir)(spark).events
      .selectExpr("unix_micros(ts) div 86400000000 AS day").collect()
      .map(_.getLong(0)).groupBy(identity).toSeq
      .map { case (d, g) => (d, g.length.toLong) }.sortBy(_._1)

  test("gain table and argmax match the cumulative-sum recompute") {
    val n = daily.size.toLong
    val s = daily.map(_._2).sum
    var sl = 0L
    val rows = daily.zipWithIndex.dropRight(1).map { case ((d, x), i) =>
      sl += x
      val nl = i + 1L
      val gain = r6(sl.toDouble * sl / nl
        + (s - sl).toDouble * (s - sl) / (n - nl)
        - s.toDouble * s / n)
      (d, x, nl, sl, gain)
    }
    val bestDay = rows.sortBy(t => (-t._5, t._1)).head._1
    val expect = rows.map(t => (t._1, t._2, t._3, t._4, t._5, t._1 == bestDay))
    val got = EventAnalytics.queries("events_changepoint").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    assert(got.count(_._6) == 1)
  }

  test("the flagged split minimizes total within-segment SSE (ground truth)") {
    val xs = daily.map(_._2.toDouble)
    def sse(v: Seq[Double]): Double = {
      val m = v.sum / v.size; v.map(x => (x - m) * (x - m)).sum
    }
    val best = (1 until xs.size).minBy(i => sse(xs.take(i)) + sse(xs.drop(i)))
    val flagged = EventAnalytics.queries("events_changepoint").fn(spark, dir)
      .where("is_changepoint").collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(daily(best - 1)._1))
  }

  test("changepoint tree: recursive driver segmentation reproduces every split") {
    // driver binary segmentation to depth 3, same gain chain and ties
    def splitOf(seg: Seq[(Long, Long)]): Option[(Long, Long, Long, Double)] = {
      if (seg.size < 2) return None
      val n = seg.size.toLong
      val s = seg.map(_._2).sum
      var sl = 0L
      val cands = seg.zipWithIndex.dropRight(1).map { case ((d, x), i) =>
        sl += x
        val nl = i + 1L
        (d, nl, n - nl, r6(sl.toDouble * sl / nl
          + (s - sl).toDouble * (s - sl) / (n - nl) - s.toDouble * s / n))
      }
      Some(cands.sortBy(t => (-t._4, t._1)).head)
    }
    def walk(seg: Seq[(Long, Long)], segId: Long, depth: Int):
        Seq[(Int, Long, Long, Long, Long, Double)] =
      if (depth > 3) Nil
      else splitOf(seg) match {
        case None => Nil
        case Some((d, nl, nr, g)) =>
          (depth, segId, d, nl, nr, g) +:
            (walk(seg.takeWhile(_._1 <= d), segId * 2, depth + 1) ++
              walk(seg.dropWhile(_._1 <= d), segId * 2 + 1, depth + 1))
      }
    val expect = walk(daily, 0L, 1).sortBy(t => (t._1, t._3))
    val got = EventAnalytics.queries("events_changepoint_tree").fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq.sortBy(t => (t._1, t._3))
    assert(got == expect && got.nonEmpty)
    // depth-1 split day agrees with the single-changepoint query
    val single = EventAnalytics.queries("events_changepoint").fn(spark, dir)
      .where("is_changepoint").collect().map(_.getLong(0)).head
    assert(got.filter(_._1 == 1).map(_._3) == Seq(single))
    // per depth, split days are strictly increasing (segments disjoint)
    got.groupBy(_._1).values.foreach { rows =>
      val days = rows.sortBy(_._3).map(_._3)
      assert(days == days.distinct.sorted)
    }
  }
}
