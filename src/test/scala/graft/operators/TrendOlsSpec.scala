package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** OLS trend pinned against a BigInt driver recompute of the sufficient
  * statistics and the final correctly-rounded float chain, plus the
  * mergeable-register property the streaming/partitioned deployment
  * relies on: per-shard (n, Σx, Σy, Σx², Σxy) must ADD to the
  * whole-corpus registers. */
class TrendOlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val hourly: Map[(String, Long), Long] = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.sources.Tables(TestSpark.Sf0001).events
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def sums(rows: Iterable[((String, Long), Long)]): Map[String, (Long, BigInt, BigInt, BigInt, BigInt)] =
    rows.groupBy(_._1._1).map { case (t, g) =>
      val h0 = g.map(_._1._2).min
      val xs = g.map { case ((_, h), y) => (BigInt(h - h0), BigInt(y)) }
      t -> (xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum,
        xs.map(p => p._1 * p._1).sum, xs.map(p => p._1 * p._2).sum)
    }

  test("slope/intercept match a BigInt driver recompute") {
    val expect = sums(hourly).collect { case (t, (n, sx, sy, sxx, sxy)) if n >= 2 =>
      val den = (BigInt(n) * sxx - sx * sx).toDouble
      val slope = BigDecimal((BigInt(n) * sxy - sx * sy).toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val icept = BigDecimal((sy * sxx - sx * sxy).toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, n, slope, icept)
    }.toSet
    val got = EventAnalytics.queries("events_trend_ols").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("sufficient statistics are mergeable registers: shard sums add to corpus sums") {
    // shard the HOURLY table (the landed register granularity) by hour parity
    val (a, b) = hourly.partition { case ((_, h), _) => h % 2 == 0 }
    val whole = sums(hourly)
    // registers from each shard, X MEASURED FROM THE GLOBAL h0 (the
    // deployment convention: shards agree on the origin, then sums add)
    def sumsFrom(rows: Iterable[((String, Long), Long)], h0s: Map[String, Long]) =
      rows.groupBy(_._1._1).map { case (t, g) =>
        val xs = g.map { case ((_, h), y) => (BigInt(h - h0s(t)), BigInt(y)) }
        t -> (xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum,
          xs.map(p => p._1 * p._1).sum, xs.map(p => p._1 * p._2).sum)
      }
    val h0s = hourly.keys.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val (sa, sb) = (sumsFrom(a, h0s), sumsFrom(b, h0s))
    val merged = (sa.keySet ++ sb.keySet).map { t =>
      val za = sa.getOrElse(t, (0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0)))
      val zb = sb.getOrElse(t, (0L, BigInt(0), BigInt(0), BigInt(0), BigInt(0)))
      t -> (za._1 + zb._1, za._2 + zb._2, za._3 + zb._3, za._4 + zb._4, za._5 + zb._5)
    }.toMap
    assert(merged == whole && whole.nonEmpty)
  }
}
