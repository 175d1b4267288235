package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The approximate-percentile sketch's actual contract is a RANK error
  * bound (≤ n/accuracy positions off the exact order statistic), not a
  * value bound — so that is what the spec asserts, per group. */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  import spark.implicits._

  test("per-group p50/p90/p99 land within the sketch's rank-error bound") {
    val accuracy = 10000
    val got = AnalyticsQueries.approxOrderPercentiles(spark, dir, accuracy)
      .select("o_orderpriority", "p50", "p90", "p99")
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val exactByGroup = graft.sources.Tables(dir).orders
      .select("o_orderpriority", "o_totalprice")
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(got.keySet == exactByGroup.keySet && got.nonEmpty)
    got.foreach { case (grp, approx) =>
      val sorted = exactByGroup(grp)
      val n = sorted.length
      val maxRankErr = math.max(1, n / accuracy)
      Seq(0.5, 0.9, 0.99).zip(approx).foreach { case (q, v) =>
        // rank of the returned value in the exact ordering
        val rank = sorted.count(_ <= v)
        val target = math.ceil(q * n).toLong
        assert(math.abs(rank - target) <= maxRankErr + 1,
          s"$grp q=$q: value $v has rank $rank, exact target $target (n=$n)")
      }
    }
  }
}
