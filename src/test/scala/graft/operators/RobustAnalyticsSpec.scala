package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The robust-analytics pair added mid-round-8 (quantity-weighted median,
  * per-nation OLS revenue trend), pinned against exact driver recomputes:
  * decimal cumulative weights on BigDecimal, OLS moments on exact
  * decimal/BigInt lanes with the one float chain re-run in the registered
  * association. */
class RobustAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("weighted median matches the cumulative-weight rank recompute") {
    val li = graft.sources.Tables(dir)(spark).lineitem
      .selectExpr("l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "CAST(l_linenumber AS BIGINT)")
      .collect()
      .map(r0 => (r0.getString(0), r0.getDouble(1), r0.getDouble(2), r0.getLong(3), r0.getLong(4)))
    val expect = li.groupBy(_._1).toSeq.map { case (flag, rows) =>
      val sorted = rows.sortBy(t => (t._2, t._4, t._5))
      val tot = sorted.map(t => d6(t._3)).sum
      var cum = BigDecimal(0)
      val medians = sorted.flatMap { t =>
        cum += d6(t._3)
        if (cum * 2 >= tot) Some(t._2) else None
      }
      (flag, medians.min, tot.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = AnalyticsQueries.queries("q_weighted_median").fn(spark, dir)
      .collect().map(r0 => (r0.getString(0), r0.getDouble(1), r0.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 3)
    // a weighted median is a real price inside the group's range
    got.foreach { case (_, m, tq) => assert(m > 0 && tq > 0) }
  }

  test("revenue trend matches the exact-moment OLS recompute per nation") {
    val t = graft.sources.Tables(dir)(spark)
    val nat = t.nation
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1))).toMap
    val cust = t.customer
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toMap
    // same year/month extraction as the query (the engine's o_orderdate lane)
    val orders = t.orders
      .selectExpr("o_custkey",
        "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS x",
        "o_totalprice").collect()
      .map(r0 => (r0.getLong(0), r0.getInt(1), r0.getDouble(2)))
    val monthly = orders.groupBy { case (ck, x, _) => (nat(cust(ck)), x) }
      .map { case ((name, x), os) => (name, x.toLong, os.map(o => d6(o._3)).sum) }
    val expect = monthly.groupBy(_._1).toSeq.map { case (name, cells) =>
      val n = cells.size.toLong
      val sx = cells.map(_._2).sum
      val sxx = cells.map(c => c._2 * c._2).sum
      val sy = cells.map(_._3).sum
      val sxy = cells.map(c => BigDecimal(c._2) * c._3).sum
      val slope = r((BigDecimal(n) * sxy - BigDecimal(sx) * sy).toDouble
        / (n * sxx - sx * sx).toDouble, 6)
      val intercept = r((sy.toDouble - slope * sx.toDouble) / n.toDouble, 4)
      (name, n, slope, intercept)
    }.sortBy(_._1)
    val got = AnalyticsQueries.queries("q_revenue_trend").fn(spark, dir)
      .collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getDouble(2), r0.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 25)
  }
}
