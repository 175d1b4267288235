package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Join-key skew audit pinned against a literal per-key-rank driver
  * recompute: the grouped (count-of-counts) rank-block formula the query
  * uses must equal the naive sorted-counts Gini, and top-share/cardinality
  * must match direct counting. */
class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("skew audit matches the naive sorted-rank Gini") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    val ords = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0))
    val cols: Seq[(String, Seq[Long])] = Seq(
      "l_orderkey" -> li.map(_.getLong(0)).toSeq,
      "l_partkey" -> li.map(_.getLong(1)).toSeq,
      "l_suppkey" -> li.map(_.getLong(2)).toSeq,
      "o_custkey" -> ords.toSeq)
    val expect = cols.map { case (name, keys) =>
      val counts = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      val n = counts.size.toLong
      val s = counts.sum
      // naive definition: ranks over the fully sorted per-key counts
      val sumic = counts.zipWithIndex.map { case (c, i) => BigInt(i + 1) * c }.sum
      val gini = (BigInt(2000000) * sumic / (BigInt(n) * s) -
        BigInt(1000000) * (n + 1) / n).toLong
      (name, keys.size.toLong, n, counts.max, counts.max * 1000000L / s, gini)
    }.sortBy(_._1)
    val got = JoinQueries.skewAudit(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got == expect)
    // uniform-ish key (l_suppkey) must read LESS skewed than l_orderkey
    val g = got.map(t => t._1 -> t._6).toMap
    assert(g("l_suppkey") < g("l_orderkey"))
  }
}
