package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Support-weighted PageRank pinned against a full driver recompute of the
  * integer iteration: the co-purchase backbone (pair support ≥ 2) rebuilt
  * from raw lineitem tuples, then exactly 4 rounds of the scaled-bigint
  * update r' = teleport + (85·Σ(r div wsum)·w) div 100 in plain Long
  * arithmetic — truncating division included, so the engine's executor
  * counts, the oracle's CTE chain, and this recompute must agree to the
  * bit, not approximately. */
class PagerankWeightedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val PrScale = 1000000000000L
  private val Iters = 4

  test("weighted pagerank top-50 matches the Long-exact driver iteration") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val support = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).collect { case ((a, b), g) if g.size >= 2 =>
      (a, b, g.size.toLong)
    }.toSeq
    val sym = support.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wsum = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val teleport = PrScale * 15L / 100L
    var ranks: Map[Long, Long] = wsum.keys.map(_ -> PrScale).toMap
    for (_ <- 1 to Iters) {
      val insum = sym.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (ranks(s) / wsum(s)) * w
      }.sum).toMap
      ranks = insum.map { case (n, in) => n -> (teleport + (85L * in) / 100L) }
    }
    val expect = ranks.toSeq.sortBy { case (n, r) => (-r, n) }.take(50)
    val got = GraphQueries.queries("graph_pagerank_weighted").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect && got.size == 50)
    // rank mass stays positive and above the teleport floor
    assert(got.forall(_._2 >= teleport))
  }
}
