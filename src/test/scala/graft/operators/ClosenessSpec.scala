package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sampled bounded-hop closeness pinned against a literal driver BFS:
  * seed sampling, hop distances, reach, and the integer harmonic sums. */
class ClosenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("closeness matches a driver multi-source BFS") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val adj: Map[Long, Set[Long]] = li.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.distinct.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val seeds = adj.keys.toSeq
      .sortBy(n => (java.lang.Long.parseLong(md5hex(n.toString).substring(0, 8), 16), n))
      .take(32).sorted
    val expect = seeds.map { seed =>
      var visited = Map(seed -> 0)
      var frontier = Set(seed)
      for (k <- 1 to 3) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- visited.keySet
        visited ++= next.map(_ -> k)
        frontier = next
      }
      val hops = visited.values.toSeq
      (seed, hops.size.toLong, hops.map(_.toLong).sum,
        hops.filter(_ > 0).map(1000000L / _).sum)
    }
    val got = GraphQueries.closeness(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // reach can never exceed the graph and the seed itself always counts
    assert(got.forall(t => t._2 >= 1 && t._4 >= 0))
  }
}
