package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Containment dedup pinned against a driver recompute of the
  * rare-shingle blocker and the asymmetric verify — plus the property the
  * operator exists for: a synthetic quote-inclusion pair (near-zero
  * Jaccard, full containment) must surface through the rare anchors. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(text: String): Seq[String] = {
    val w = text.split("\\s+").filter(_.nonEmpty).toSeq
    if (w.size >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq(w.mkString(" "))
  }

  test("flagged pairs match the driver blocker + verify") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), shingles(r.getString(1)).toSet))
    val df = docs.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val rare = df.filter { case (_, ids) => ids.size >= 2 && ids.size <= 5 }
    val cand = rare.values.flatMap { ids =>
      val v = ids.toSeq.sorted
      for (a <- v; b <- v if a < b) yield (a, b)
    }.toSet
    val byId = docs.toMap
    val expect = cand.toSeq.flatMap { case (a, b) =>
      val (sa, sb) = (byId(a), byId(b))
      val inter = (sa & sb).size.toLong
      val cont = inter * 1000 / math.min(sa.size, sb.size)
      if (cont >= 500)
        Some((a, b, sa.size.toLong, sb.size.toLong, inter, cont,
          inter * 1000 / (sa.size + sb.size - inter)))
      else None
    }.sortBy(t => (t._1, t._2))
    val got = DedupQueries.containment(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
  }

  test("a quote-inclusion pair surfaces at near-zero Jaccard") {
    // driver-side property on the blocker+verify logic: a 40-shingle doc
    // quoting a 5-shingle doc verbatim — containment 1000, Jaccard ~110
    val small = (0 until 7).map(i => s"q$i").mkString(" ")
    val bigWords = (0 until 40).map(i => s"b$i") ++ small.split(" ")
    val a = shingles(small).toSet
    val b = shingles(bigWords.mkString(" ")).toSet
    val inter = (a & b).size
    assert(inter == a.size) // every quote shingle carried
    assert(inter * 1000 / math.min(a.size, b.size) == 1000)
    assert(inter * 1000 / (a.size + b.size - inter) < 150)
  }
}
