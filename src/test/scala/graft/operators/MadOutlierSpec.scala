package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MAD outlier gate: exact lower-median semantics and the robustness
  * property that distinguishes it from the moment-based gate. */
class MadOutlierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("gate matches a driver-side recompute of lower-median MAD at sf0.001") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val vals = graft.sources.Tables(sf)(spark).events
      .select($"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    def lowerMedian(xs: Seq[BigDecimal]): BigDecimal = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val expected = vals.groupBy(_._2).flatMap { case (tpe, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      val devs = rows.map { case (id, _, v) => (id, (v - med).abs) }
      val mad = lowerMedian(devs.map(_._2).toSeq)
      devs.filter(_._2 > mad * 5).map { case (id, _) => id }.toSeq
    }.toSet
    val got = EventAnalytics.queries("events_mad_outliers").fn(spark, sf)
      .select("event_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 events should contain MAD outliers")
  }

  test("median/MAD are breakdown-resistant where mean/stddev are not") {
    import spark.implicits._
    // 8 well-behaved points + one wild value: the MAD gate flags ONLY the
    // wild point; a 3-sigma mean gate is dragged so far it flags nothing
    // (a lone outlier's z is bounded by (n-1)/sqrt(n) ≈ 2.67 at n = 9,
    // no matter HOW wild the value — the gate is structurally blind)
    val base = (1 to 8).map(i => (i.toLong, "t", 100.0 + (i % 5)))
    val wild = Seq((99L, "t", 1e9))
    val df = (base ++ wild).toDF("event_id", "event_type", "value")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val e = df.select($"event_id", $"event_type", $"value".cast(dec).as("v"))
    // reuse the operator's logic by inlining its shape on this frame
    val vals = e.collect().map(r => (r.getLong(0), r.getDecimal(2)))
    def lm(xs: Seq[java.math.BigDecimal]): java.math.BigDecimal =
      xs.sortBy(BigDecimal(_)).apply((xs.size + 1) / 2 - 1)
    val med = lm(vals.map(_._2).toSeq)
    val devs = vals.map { case (id, v) => (id, v.subtract(med).abs) }
    val mad = lm(devs.map(_._2).toSeq)
    val flagged = devs.filter { case (_, d) =>
      BigDecimal(d) > BigDecimal(mad) * 5 }.map(_._1).toSet
    assert(flagged == Set(99L))
    // the moment gate misses it: the wild point inflates sigma so much
    // that |wild - mean| < 3 sigma
    val xs = (base ++ wild).map(_._3)
    val mean = xs.sum / xs.size
    val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    assert(math.abs(1e9 - mean) < 3 * sigma)
  }
}
