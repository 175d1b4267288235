package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CUPED readout pinned against a driver recompute of the pre/post
  * split, the pooled theta, and the adjusted means — plus CUPED's
  * defining identity: the user-weighted adjusted means recombine to the
  * global post mean (the adjustment is mean-preserving). */
class CupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("arm rows match the driver CUPED pipeline") {
    val ev = graft.sources.Tables(TestSpark.Sf0001)(spark).events
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      val arm = if (java.lang.Long.parseLong(
        md5hex("graft-ab-v1" + u).substring(0, 8), 16) % 2 == 0) "A" else "B"
      (u, arm, es.count(_._2 < mid).toLong, es.count(_._2 >= mid).toLong)
    }
    val n = perUser.size.toLong
    val sx = perUser.map(_._3).sum; val sy = perUser.map(_._4).sum
    val sxy = perUser.map(t => t._3 * t._4).sum
    val sx2 = perUser.map(t => t._3 * t._3).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sx2 - sx * sx).toDouble
    val expect = perUser.groupBy(_._2).toSeq.map { case (arm, us) =>
      val na = us.size.toLong
      val sxa = us.map(_._3).sum; val sya = us.map(_._4).sum
      (arm, na, sya, r6(sya.toDouble / na),
        r6(sya.toDouble / na - theta * (sxa.toDouble / na - sx.toDouble / n)))
    }.sortBy(_._1)
    val got = EventAnalytics.cuped(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 2)
    // mean-preserving: user-weighted adjusted means recombine to Ȳ_all
    val pooled = got.map(t => t._5 * t._2).sum / n
    assert(math.abs(pooled - sy.toDouble / n) < 1e-4)
  }
}
