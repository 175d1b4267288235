package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The experiment-readout quartet (trimmed/winsorized means,
  * post-stratification, MDE power table, paired diff-in-diff), each
  * pinned against an independent driver recompute — arm deals re-derived
  * from md5 directly, integer lanes on BigInt, float chains re-run in
  * the exact association the queries document.
  */
class ExperimentReadoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def arm(u: Long): String =
    if (java.lang.Long.parseLong(md5hex("graft-ab-v1" + u).substring(0, 8), 16) % 2 == 0) "A"
    else "B"
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val ev: Array[(Long, Long, String, Double)] =
    graft.sources.Tables(dir)(spark).events
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type", "CAST(value AS DOUBLE)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
  private def vu(v: Double): Long =
    BigDecimal(v * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("trimmed + winsorized means match the sorted-rank recompute") {
    val expect = ev.groupBy(t => arm(t._1)).toSeq.map { case (a, es) =>
      val vs = es.map(t => vu(t._4)).sorted
      val n = vs.length
      val k = n / 100
      val sv = vs.map(BigInt(_)).sum
      val trimmed = vs.slice(k, n - k) // ranks (k, n-k], 0-indexed [k, n-k)
      val trimSum = trimmed.map(BigInt(_)).sum
      val lo = vs(k)       // rank k+1
      val hi = vs(n - k - 1) // rank n-k
      val winSum = trimSum + BigInt(k) * lo + BigInt(k) * hi
      (a, n.toLong, r6(sv.toDouble / n / 1000000.0),
        r6(trimSum.toDouble / (n - 2 * k) / 1000000.0),
        r6(winSum.toDouble / n / 1000000.0))
    }.sortBy(_._1)
    val got = EventAnalytics.queries("events_trimmed_mean").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 2)
    // trimming and winsorizing both temper the tails: bounded by min/max
    got.foreach { case (_, _, mean, tm, wm) =>
      assert(tm >= 0 && wm >= 0 && math.abs(tm - mean) < mean && math.abs(wm - mean) < mean)
    }
  }

  test("post-stratified mean matches the independent per-stratum-term recompute") {
    val cells = ev.groupBy(t => (arm(t._1), t._3)).toSeq.map { case ((a, g), es) =>
      (a, g, es.length.toLong, es.map(t => BigInt(vu(t._4))).sum)
    }
    val nG = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nAll = nG.values.sum
    val expect = cells.groupBy(_._1).toSeq.map { case (a, cs) =>
      val n = cs.map(_._3).sum
      val sA = cs.map(_._4).sum
      val psU = cs.map { case (_, g, nag, sag) =>
        math.round((nG(g).toDouble * sag.toDouble) / (nAll.toDouble * nag))
      }.sum
      (a, n, math.round(sA.toDouble / n), psU)
    }.sortBy(_._1)
    val got = EventAnalytics.queries("events_post_strat").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 2)
    // post-strat is a reweighting, not a rescaling: stays near the raw mean
    got.foreach { case (_, _, raw, ps) => assert(math.abs(ps - raw) * 5 < raw) }
  }

  private lazy val perUserCounts: Map[String, Seq[Long]] =
    ev.groupBy(_._1).toSeq.map { case (u, es) => (arm(u), es.length.toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("MDE matches the pooled-variance power formula recompute") {
    val Seq((na, sya, sy2a), (nb, syb, sy2b)) = Seq("A", "B").map { a =>
      val ys = perUserCounts(a)
      (ys.size.toLong, ys.map(BigInt(_)).sum, ys.map(y => BigInt(y) * y).sum)
    }
    val ssa = (BigInt(na) * sy2a - sya * sya).toDouble / na
    val ssb = (BigInt(nb) * sy2b - syb * syb).toDouble / nb
    val varP = (ssa + ssb) / (na + nb - 2)
    val mdeAbs = r6(2.801585 * math.sqrt(varP * (1.0 / na + 1.0 / nb)))
    val expect = (na, nb, r6(sya.toDouble / na), r6(syb.toDouble / nb),
      r6(varP), mdeAbs, r6(mdeAbs / r6(sya.toDouble / na)))
    val got = EventAnalytics.queries("events_mde").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).head
    assert(got == expect)
    assert(got._6 > 0 && got._5 > 0)
  }

  test("diff-in-diff matches the paired per-user-delta recompute") {
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val pu = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (arm(u), es.count(_._2 < mid).toLong, es.count(_._2 >= mid).toLong)
    }
    val Seq((na, sxa, sya, sda, sd2a), (nb, sxb, syb, sdb, sd2b)) = Seq("A", "B").map { a =>
      val us = pu.filter(_._1 == a)
      (us.size.toLong, us.map(t => BigInt(t._2)).sum, us.map(t => BigInt(t._3)).sum,
        us.map(t => BigInt(t._3 - t._2)).sum, us.map(t => BigInt(t._3 - t._2).pow(2)).sum)
    }
    val did = r6(sdb.toDouble / nb - sda.toDouble / na)
    val z = r6((sdb.toDouble / nb - sda.toDouble / na) /
      math.sqrt((BigInt(na) * sd2a - sda * sda).toDouble / na / (na - 1) / na
        + (BigInt(nb) * sd2b - sdb * sdb).toDouble / nb / (nb - 1) / nb))
    val expect = (na, nb, r6(sxa.toDouble / na), r6(sya.toDouble / na),
      r6(sxb.toDouble / nb), r6(syb.toDouble / nb), did, z, math.abs(z) > 1.96)
    val got = EventAnalytics.queries("events_diff_in_diff").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8))).head
    assert(got == expect)
  }
}
