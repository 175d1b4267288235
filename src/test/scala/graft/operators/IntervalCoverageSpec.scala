package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Day-decomposed interval union vs a naive merge oracle: the union
  * MEASURE must be exact regardless of day clipping; block statistics
  * are day-grain by contract. */
class IntervalCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Day = 86400000000L

  /** Naive union measure of half-open intervals: sort, merge, sum. */
  private def naiveUnion(ivs: Seq[(Long, Long)]): Long = {
    val sorted = ivs.filter(t => t._2 > t._1).sortBy(_._1)
    if (sorted.isEmpty) return 0L
    var total = 0L
    var (cs, ce) = sorted.head
    for ((s, e) <- sorted.tail) {
      if (s > ce) { total += ce - cs; cs = s; ce = e }
      else if (e > ce) ce = e
    }
    total + (ce - cs)
  }

  // interval soup per key: overlaps, nestings, exact-touching ends,
  // midnight-crossers (spans > 1 day), and zero-length degenerates
  private def soup(key: String, seed: Long): Seq[(String, Long, Long)] =
    (1L to 80L).map { i =>
      val s = (i * 9973L * seed) % (3 * Day)
      val len = ((i * 131L * seed) % (Day / 2)) * (if (i % 7 == 0) 3 else 1)
      (key, s, s + len) // len 0 when the modulus lands on 0 — kept on purpose
    }

  test("union measure matches the naive merge oracle; keys are independent") {
    val data = soup("a", 1) ++ soup("b", 5) ++ soup("c", 11)
    val df = data.toDF("k", "s_us", "e_us")
    val got = IntervalCoverage.coverageOf(df, "k")
      .select("k", "covered_us").as[(String, Long)].collect().toMap
    val want = data.groupBy(_._1).map { case (k, xs) =>
      k -> naiveUnion(xs.map(t => (t._2, t._3)))
    }
    assert(got == want)
  }

  test("single interval spanning three days: exact measure, one block per day") {
    val df = Seq(("x", Day / 2, 2 * Day + Day / 4)).toDF("k", "s_us", "e_us")
    val r = IntervalCoverage.coverageOf(df, "k")
      .select("covered_us", "n_day_blocks", "max_block_us")
      .as[(Long, Long, Long)].head()
    assert(r._1 == (2 * Day + Day / 4) - Day / 2)
    assert(r._2 == 3, "one day-grain block per day touched")
    assert(r._3 == Day, "the full middle day is the longest block")
  }

  test("touching half-open intervals don't double-count; zero-length vanish") {
    val df = Seq(("t", 0L, 100L), ("t", 100L, 200L), ("t", 50L, 50L))
      .toDF("k", "s_us", "e_us")
    val r = IntervalCoverage.coverageOf(df, "k")
      .select("covered_us").as[Long].head()
    assert(r == 200L)
  }

  test("registered type-coverage query: sane bounds at sf0.001") {
    val out = IntervalCoverage.typeCoverage(spark, TestSpark.Sf0001)
      .select("event_type", "covered_us", "n_day_blocks", "max_block_us")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, cov, nb, mx) => cov > 0 && nb > 0 && mx <= cov && mx <= Day })
  }
}
