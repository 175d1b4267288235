package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle analytics over events: dyadic EWMA smoothing and the
  * Kaplan-Meier churn curve. Both are pinned to independent driver
  * recomputes — EWMA bit-for-bit (its whole point is engine-exact float
  * arithmetic), KM through the identical float formulation. */
class EventLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  /** (user_id, event_id, epoch µs, value) sorted the window's way. */
  private lazy val events: Seq[(Long, Long, Long, Double)] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables(dir)(spark).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3, t._2))
  }

  test("dyadic ewma matches a driver recompute bit-for-bit") {
    val expect = events.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sliding(8).collect { case win if win.size == 8 =>
        val v = win.map(_._4).reverse // v(0) = newest
        val ewma = v(0) / 2 + v(1) / 4 + v(2) / 8 + v(3) / 16 +
          v(4) / 32 + v(5) / 64 + v(6) / 128 + v(7) / 128
        win.last._2 -> ewma
      }
    }.toMap
    val got = EventAnalytics.ewma(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(got.size == expect.size && got.nonEmpty)
    // exact double equality — the operator's contract is NO rounding step
    expect.foreach { case (id, e) => assert(got(id) == e, s"event $id") }
  }

  test("user feature matrix matches a driver recompute exactly") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables(dir)(spark).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val horizon = raw.map(_._2).max
    val dayUs = 86400000000L
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      val us = rows.map(_._2)
      val sumDec = rows.map(r => BigDecimal(r._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum // DECIMAL(28,6) sum — exact, order-free
      u -> (rows.size.toLong,
        rows.count(_._3 == "purchase").toLong,
        (us.max - us.min) / dayUs,
        (horizon - us.max) / dayUs,
        us.map(_ / dayUs).distinct.size.toLong,
        sumDec.toDouble,
        rows.map(_._4).max)
    }
    val got = EventAnalytics.userFeatures(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getDouble(8), r.getDouble(10))
    }.toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
  }

  test("cohort LTV matrix matches a driver recompute exactly") {
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables(dir)(spark).events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("long"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // timestamp.cast(long) = epoch SECONDS in Spark
    val weekS = 7L * 86400L
    val cohort = raw.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).min }
    val expect = raw.filter(_._3 == "purchase").groupBy { t =>
      (cohort(t._1), (t._2 - cohort(t._1)) / weekS)
    }.map { case (k, rows) =>
      val rev = rows.map(r => BigDecimal(r._4).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      k -> (rows.map(_._1).distinct.size.toLong, rows.size.toLong, rev.toDouble)
    }
    val got = EventAnalytics.cohortLtv(spark, dir).collect().map { r =>
      (r.getTimestamp(0).toInstant.getEpochSecond, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))
    }.toMap
    assert(got == expect && got.nonEmpty)
  }

  test("seasonal outliers match a driver recompute at sf0.01 (cells too thin at sf0.001)") {
    import org.apache.spark.sql.functions._
    val d01 = "/root/testdata/sf0.01"
    val rows = graft.sources.Tables(d01)(spark).events
      .select(col("event_id"), (weekday(col("ts")) + 1).cast("int"),
        hour(col("ts")).cast("int"), col("value"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val expect = rows.groupBy(t => (t._2, t._3)).flatMap { case (_, cell) =>
      val n = cell.size.toDouble
      // the operator's exact-DECIMAL sums, reproduced with BigDecimal
      val sx = cell.map(t => BigDecimal(t._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val sxx = cell.map(t => BigDecimal(t._4 * t._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
      if (n < 30 || !(sd > 0)) Seq.empty[(Long, Double)]
      else cell.toSeq.flatMap { t =>
        val z = (t._4 - sx / n) / sd
        if (math.abs(z) > 3)
          Some(t._1 -> BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      }
    }
    val got = EventAnalytics.seasonalOutliers(spark, d01)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got == expect.toMap && got.nonEmpty)
  }

  test("KM survival matches a driver recompute and is a valid survival curve") {
    val dayUs = 86400000000L
    val spans = events.groupBy(_._1).map { case (_, rows) =>
      val us = rows.map(_._3)
      (us.min, us.max)
    }.toSeq
    val horizon = spans.map(_._2).max
    val users = spans.map { case (f, l) => ((l - f) / dayUs, l < horizon - dayUs) }
    val byD = users.groupBy(_._1).map { case (d, us) =>
      (d, us.size.toLong, us.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val expect = {
      var cum = 0.0
      val totalAtOrAbove = byD.map(_._1).map(t => t -> users.count(_._1 >= t).toLong).toMap
      byD.filter(_._3 > 0).map { case (d, _, deaths) =>
        val n = totalAtOrAbove(d)
        cum += math.log((n - deaths).toDouble / n.toDouble)
        (d, n, deaths, BigDecimal(math.exp(cum)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = EventAnalytics.survival(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == expect && expect.nonEmpty)
    // survival-curve shape: S is non-increasing in t, within (0, 1]
    got.map(_._4).foldLeft(1.0) { (prev, s) =>
      assert(s <= prev + 1e-12 && s > 0 && s <= 1); s
    }
    // risk set shrinks as t grows
    got.map(_._2).foldLeft(Long.MaxValue) { (prev, n) => assert(n <= prev); n }
  }
}
