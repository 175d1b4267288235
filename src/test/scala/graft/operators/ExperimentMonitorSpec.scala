package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The experiment-monitoring quartet (SRM, always-valid mSPRT, Poisson
  * bootstrap CI, hourly ACF) and the t-closeness release audit, each
  * pinned against an independent driver recompute of the full pipeline —
  * hash deals re-derived from md5 directly, integer lanes on BigInt.
  */
class ExperimentMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def hex8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // (user_id, event_id, us, value) collected once; every recompute below
  // derives its own aggregates from this row set.
  private lazy val ev: Array[(Long, Long, Long, Double)] =
    graft.sources.Tables(dir)(spark).events
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "CAST(value AS DOUBLE)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  private def arm(u: Long): String =
    if (hex8("graft-ab-v1" + u) % 2 == 0) "A" else "B"

  test("srm check matches a per-day driver recompute of the chi-square") {
    val byDay = ev.groupBy(t =>
      java.time.Instant.ofEpochSecond(t._3 / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
    val expect = byDay.toSeq.map { case (day, es) =>
      val na = es.count(t => arm(t._1) == "A").toLong
      val nb = es.size - na
      val chi2 = r6(((na - nb) * (na - nb)).toDouble / (na + nb))
      (day, na, nb, chi2, chi2 > 10.83)
    }.sortBy(_._1)
    val got = EventAnalytics.queries("events_srm_check").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
  }

  /** The gap-filled hourly count series shared by the ACF and mSPRT
    * recomputes: hour → (n_a, n_b), dense over [min, max]. */
  private lazy val hourly: Seq[(Long, Long, Long)] = {
    val byH = ev.groupBy(_._3 / 3600000000L)
    val h0 = byH.keys.min; val h1 = byH.keys.max
    (h0 to h1).map { h =>
      val es = byH.getOrElse(h, Array.empty[(Long, Long, Long, Double)])
      val na = es.count(t => arm(t._1) == "A").toLong
      (h, na, es.size - na)
    }
  }

  test("acf matches the exact-integer estimator on the gap-filled series") {
    val xs = hourly.map(t => BigInt(t._2 + t._3))
    val n = BigInt(xs.size)
    val s = xs.sum
    val s2 = xs.map(x => x * x).sum
    val expect = (1 to 24).map { k =>
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      val np = BigInt(pairs.size)
      val sxy = pairs.map { case (a, b) => a * b }.sum
      val sa = pairs.map(_._1).sum
      val sb = pairs.map(_._2).sum
      val num = n * n * sxy - n * s * (sa + sb) + np * s * s
      val den = n * n * s2 - n * s * s
      (k.toLong, pairs.size.toLong, r6(num.toDouble / den.toDouble))
    }
    val got = EventAnalytics.queries("events_acf").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(got == expect)
    // sample ACF of a real series stays inside the unit band
    got.foreach { case (_, _, a) => assert(math.abs(a) <= 1.0) }
  }

  test("msprt matches the cumulative mixture-LLR recompute; LLR grows with |S|") {
    val tau2 = 100.0
    var ca = 0L; var cb = 0L
    // the query groups raw events, so empty hours never appear (and they
    // add 0 to the cumulative sums either way)
    val expect = hourly.collect {
      case (h, na, nb) if na + nb > 0 =>
        ca += na; cb += nb
        val v = (ca + cb).toDouble
        val llr = r6(0.5 * math.log(v / (v + tau2)) +
          (ca - cb).toDouble * (ca - cb) * tau2 / (2.0 * v * (v + tau2)))
        (h, ca, cb, llr, llr > 2.995732)
    }
    val got = EventAnalytics.queries("events_msprt").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
  }

  test("bootstrap CI matches the deterministic user-level Poisson-weight recompute") {
    val ladder = Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L)
    // per-user sufficient stats: (arm, user, sum of µ-unit values, n)
    val pu = ev.groupBy(_._1).toSeq.map { case (uid, es) =>
      val su = es.map(t =>
        BigInt(BigDecimal(t._4 * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)).sum
      (arm(uid), uid, su, es.length.toLong)
    }
    val reps = for {
      (a, uid, su, nu) <- pu
      b <- 0 until 64
    } yield {
      val digest = md5hex(s"graft-boot-v1:$uid:${b / 8}")
      val u = java.lang.Long.parseLong(digest.substring((b % 8) * 4, (b % 8) * 4 + 4), 16)
      val w = ladder.indexWhere(u < _) match {
        case -1 => ladder.size.toLong
        case i  => i.toLong
      }
      (a, b.toLong, w, su, nu)
    }
    val means = reps.groupBy(t => (t._1, t._2)).toSeq.map { case ((a, b), rs) =>
      val swn = rs.map(t => BigInt(t._3) * t._5).sum
      val sws = rs.map(t => BigInt(t._3) * t._4).sum
      (a, b, if (swn == 0) 0.0 else r6(sws.toDouble / swn.toDouble / 1000000.0))
    }
    val expect = means.groupBy(_._1).toSeq.map { case (a, ms) =>
      val ranked = ms.sortBy(t => (t._3, t._2)).map(_._3)
      val full = pu.filter(_._1 == a)
      val mean = r6(full.map(_._3).sum.toDouble / full.map(_._4).sum.toDouble / 1000000.0)
      (a, mean, ms.size.toLong, ranked(3), ranked(60)) // ranks 4 and 61, 1-indexed
    }.sortBy(_._1)
    val got = EventAnalytics.queries("events_bootstrap_ci").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 2)
    got.foreach { case (_, mean, _, lo, hi) =>
      assert(lo <= hi)
      assert(lo <= mean && mean <= hi) // 90% CI brackets the point estimate here
    }
  }

  test("t-closeness matches the exact variational-distance recompute") {
    val docs = graft.sources.Tables(dir)(spark).documents
      .selectExpr("lang", "n_chars div 100 AS lb", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val cell = docs.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val sources = docs.map(_._3).distinct.toSeq
    val nS = sources.map(s => s -> docs.count(_._3 == s).toLong).toMap
    val nAll = BigInt(docs.length)
    val expect = docs.map(t => (t._1, t._2)).distinct.toSeq.map { case (lang, lb) =>
      val nC = BigInt(docs.count(t => t._1 == lang && t._2 == lb))
      val num = sources.map { s =>
        (BigInt(cell.getOrElse((lang, lb, s), 0L)) * nAll - BigInt(nS(s)) * nC).abs
      }.sum
      val tPpm = (num * 1000000 / (2 * nC * nAll)).toLong
      (lang, lb, nC.toLong, tPpm, tPpm > 400000L)
    }.sortBy(t => (t._1, t._2))
    val got = TextQueries.queries("docs_tcloseness_audit").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
    // variational distance lives in [0, 1] ⇒ ppm in [0, 1e6]
    got.foreach { case (_, _, _, t, _) => assert(t >= 0 && t <= 1000000L) }
  }
}
