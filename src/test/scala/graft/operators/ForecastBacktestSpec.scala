package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: seasonal-naive forecast backtest pinned against a plain-Scala
  * recompute — same integer day cells, same calendar-complete zero-filled
  * grid, same lag-7 forecast and integer WAPE. */
class ForecastBacktestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backtest matches the driver recompute") {
    val rows = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .selectExpr("event_type", "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .as[(String, Long)].collect()
    val expect = rows.groupBy(_._1).map { case (t, xs) =>
      val cnt = xs.groupBy(_._2).map { case (d, ys) => d -> ys.length.toLong }
      val (d0, d1) = (cnt.keys.min, cnt.keys.max)
      val series = (d0 to d1).map(d => cnt.getOrElse(d, 0L))
      val scored = series.drop(7).zip(series.dropRight(7))
      val sumActual = scored.map(_._1).sum
      val sumAbsErr = scored.map { case (a, f) => math.abs(a - f) }.sum
      (t, scored.length.toLong, sumActual, sumAbsErr,
        sumAbsErr * 1000 / math.max(sumActual, 1L))
    }.toSeq.sorted
    val got = EventAnalytics.queries("events_forecast_backtest").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    got.foreach { case (_, n, _, _, wape) => assert(n > 0 && wape >= 0) }
  }
}
