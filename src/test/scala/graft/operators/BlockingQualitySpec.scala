package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Blocking-recall audit pinned against a driver recompute of the
  * all-pairs truth and each blocker's found count; the structural
  * invariants (segment completeness, found ⊆ truth) asserted directly. */
class BlockingQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("recall table matches a driver recompute of truth and found sets") {
    val names = spark.read.parquet(s"${TestSpark.Sf0001}/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    def truth(k: Int): Set[(String, String)] = (for {
      a <- names; b <- names if a < b
      if math.abs(a.length - b.length) <= k && lev(a, b) <= k
    } yield (a, b)).toSet
    val t2 = truth(2); val t3 = truth(3)
    def foundOf(q: String): Set[(String, String)] =
      Linkage.queries(q).fn(spark, TestSpark.Sf0001).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val tok = foundOf("link_fuzzy_parts")
    val seg = foundOf("link_fuzzy_segments")
    val snm = foundOf("link_sorted_neighborhood")
    val expect = Seq(
      ("segment_index", t2.size.toLong, seg.size.toLong),
      ("sorted_neighborhood", t3.size.toLong, snm.size.toLong),
      ("token_block", t2.size.toLong, tok.size.toLong))
      .map { case (n, nt, nf) => (n, nt, nf, nf * 1000 / nt) }
    val got = Linkage.blockingQuality(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect)
    // every blocker verifies with Levenshtein → found ⊆ truth; the
    // segment index is pigeonhole-complete → found == truth
    assert(tok.subsetOf(t2) && snm.subsetOf(t3) && seg == t2)
  }
}
