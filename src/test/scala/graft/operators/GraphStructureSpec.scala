package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Structural-summary graph queries pinned against full driver recomputes
  * over the sf0.001 co-purchase graph: assortativity's exact BigInt
  * sufficient statistics and float chain, transitivity's triangle/wedge
  * counts, and the capped resource-allocation top-k lists. */
class GraphStructureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Distinct co-purchase edges (a < b) recomputed on the driver. */
  private lazy val edges: Set[(Long, Long)] = {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
  }

  private lazy val adj: Map[Long, Set[Long]] =
    (edges.toSeq.map { case (a, b) => a -> b } ++
      edges.toSeq.map { case (a, b) => b -> a })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def deg(n: Long): Long = adj(n).size.toLong

  test("assortativity matches the exact BigInt recompute") {
    val xs = edges.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val n = BigInt(xs.size)
    val sx = xs.map(p => BigInt(p._1)).sum
    val sxy = xs.map(p => BigInt(p._1) * p._2).sum
    val sx2 = xs.map(p => BigInt(p._1) * p._1).sum
    val expectR = BigDecimal(
      (n * sxy - sx * sx).toDouble / (n * sx2 - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = GraphQueries.assortativity(spark, TestSpark.Sf0001).collect().head
    assert(row.getLong(0) == edges.size.toLong)
    assert(math.abs(row.getDouble(1) - expectR) < 1e-9)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("transitivity counts triangles and wedges exactly") {
    val tri3 = edges.toSeq.map { case (a, b) => (adj(a) & adj(b)).size.toLong }.sum
    assert(tri3 % 3 == 0)
    val triangles = tri3 / 3
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = GraphQueries.transitivity(spark, TestSpark.Sf0001).collect().head
    assert(row.getLong(0) == adj.size.toLong)
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == wedges)
    assert(row.getLong(3) == triangles)
    assert(row.getLong(4) == (BigInt(3) * triangles * 1000000 / wedges).toLong)
  }

  test("resource-allocation top-k matches the capped driver recompute") {
    val cap = 24
    val acc = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    adj.foreach { case (center, ns) =>
      val w = 1000000000L / ns.size
      val capped = ns.toSeq.sorted.take(cap)
      for (i <- capped.indices; j <- i + 1 until capped.length) {
        val k = (capped(i), capped(j))
        val (c0, r0) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (c0 + 1, r0 + w)
      }
    }
    val directed = acc.toSeq.flatMap { case ((a, b), (c, r)) =>
      Seq((a, b, c, r), (b, a, c, r))
    }
    val expect = directed.groupBy(_._1).toSeq.flatMap { case (node, cands) =>
      cands.sortBy { case (_, cand, c, r) => (-r, -c, cand) }
        .take(5).zipWithIndex
        .map { case ((_, cand, c, r), i) => (node, i + 1L, cand, c, r) }
    }.sortBy(t => (t._1, t._2))
    val got = GraphQueries.resourceAllocation(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
  }
}
