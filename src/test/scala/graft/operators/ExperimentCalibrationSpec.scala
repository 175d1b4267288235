package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The experiment-platform calibration trio (A/A null test, delta-method
  * ratio SE, decile quantile treatment effects), each pinned against an
  * independent driver recompute: arm/subarm deals re-derived from md5
  * directly, integer/BigInt sufficient statistics, and the float chains
  * re-run in the exact left-associated order the queries document —
  * the ExperimentReadoutSpec discipline applied to the r08 snapshot
  * additions (the round-9 guard-completeness sweep). */
class ExperimentCalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def deal(salt: String, u: Long): Long =
    java.lang.Long.parseLong(md5hex(salt + u).substring(0, 8), 16) % 2
  private def arm(u: Long): String = if (deal("graft-ab-v1", u) == 0) "A" else "B"
  private def subarm(u: Long): String = if (deal("graft-aa-v1", u) == 0) "A1" else "A2"
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val ev: Array[(Long, String, Double)] =
    graft.sources.Tables(dir)(spark).events
      .selectExpr("user_id", "event_type", "CAST(value AS DOUBLE)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
  private def vu(v: Double): Long =
    BigDecimal(v * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("A/A calibration matches the independent-salt Welch recompute") {
    val pu = ev.filter(t => arm(t._1) == "A").groupBy(_._1).toSeq
      .map { case (u, es) => (subarm(u), es.length.toLong) }
    val Seq((n1, sy1, sy21), (n2, sy2b, sy22)) = Seq("A1", "A2").map { a =>
      val ys = pu.filter(_._1 == a).map(_._2)
      (ys.size.toLong, ys.map(BigInt(_)).sum, ys.map(y => BigInt(y) * y).sum)
    }
    val z = r6((sy1.toDouble / n1 - sy2b.toDouble / n2) /
      math.sqrt((BigInt(n1) * sy21 - sy1 * sy1).toDouble / n1 / (n1 - 1) / n1
        + (BigInt(n2) * sy22 - sy2b * sy2b).toDouble / n2 / (n2 - 1) / n2))
    val expect = (n1, n2, r6(sy1.toDouble / n1), r6(sy2b.toDouble / n2), z,
      math.abs(z) > 1.96)
    val got = EventAnalytics.queries("events_aa_calibration").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).head
    assert(got == expect)
    // both subarms are populated and the Welch statistic is finite (at
    // sf0.001 the user base is a handful, so the means themselves can
    // legitimately diverge — the null-test calibration is a property of
    // scale, not of this replica)
    assert(got._1 > 0 && got._2 > 0 && !got._5.isNaN && !got._5.isInfinite)
  }

  test("ratio-metric delta SE matches the per-user covariance recompute") {
    val pu = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (arm(u), es.count(_._2 == "click").toLong, es.count(_._2 == "view").toLong)
    }
    val expect = Seq("A", "B").map { a =>
      val us = pu.filter(_._1 == a)
      val n = us.size.toLong
      val sx = us.map(t => BigInt(t._2)).sum
      val sy = us.map(t => BigInt(t._3)).sum
      val sx2 = us.map(t => BigInt(t._2) * t._2).sum
      val sy2 = us.map(t => BigInt(t._3) * t._3).sum
      val sxy = us.map(t => BigInt(t._2) * t._3).sum
      val nD = n.toDouble
      val ybar = sy.toDouble / nD
      val xbar = sx.toDouble / nD
      // same left-associated order as the registered expression
      val t1 = (BigInt(n) * sx2 - sx * sx).toDouble / nD / (n - 1) / ybar / ybar
      val t2 = xbar * xbar *
        ((BigInt(n) * sy2 - sy * sy).toDouble / nD / (n - 1)) / ybar / ybar / ybar / ybar
      val t3 = 2.0 * xbar *
        ((BigInt(n) * sxy - sx * sy).toDouble / nD / (n - 1)) / ybar / ybar / ybar
      (a, n, sx.toLong, sy.toLong, r6(sx.toDouble / sy.toDouble),
        r6(math.sqrt((t1 + t2 - t3) / nD)))
    }
    val got = EventAnalytics.queries("events_ratio_delta").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq.sortBy(_._1)
    assert(got == expect && got.size == 2)
    // delta SE of a per-user ratio is positive and small vs the ratio
    got.foreach { case (_, _, _, _, ratio, se) => assert(se > 0 && se < ratio) }
  }

  test("decile effects match the sorted-rank recompute at every decile") {
    val byArm = ev.groupBy(t => arm(t._1)).view
      .mapValues(_.map(t => vu(t._3)).sorted).toMap
    def decile(a: String, d: Long): Long = {
      val vs = byArm(a); val n = vs.length.toLong
      vs(((d * n + 9) / 10 - 1).toInt) // value at rank ceil(d*n/10), 1-indexed
    }
    val expect = (1L to 9L).map { d =>
      val va = decile("A", d); val vb = decile("B", d)
      (d, va, vb, vb - va)
    }
    val got = EventAnalytics.queries("events_quantile_effects").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 9)
    // deciles are monotone within each arm
    assert(got.map(_._2) == got.map(_._2).sorted && got.map(_._3) == got.map(_._3).sorted)
  }
}
