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

  test("gap list complements coverage: per day, blocks + gaps tile the active span") {
    val data = soup("a", 3) ++ soup("b", 7)
    val df = data.toDF("k", "s_us", "e_us")
    val cov = IntervalCoverage.coverageOf(df, "k")
      .select("k", "covered_us", "n_day_blocks").as[(String, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    val gaps = IntervalCoverage.gapsOf(df, "k")
      .select("k", "n_gaps", "idle_us", "max_gap_us").as[(String, Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    for (k <- cov.keys) {
      val (covered, nBlocks) = cov(k)
      val (nGaps, idle, maxGap) = gaps(k)
      assert(nGaps > 0 && idle > 0 && maxGap >= 1L && maxGap <= idle, s"key $k")
      // per (key, day): gaps = blocks - 1; idle + covered = span of active days
      val naive = data.filter(_._1 == k).map(t => (t._2, t._3))
      val byDay = naive.flatMap { case (s, e) =>
        (s / Day to (e - 1) / Day).map(d => (d, math.max(s, d * Day), math.min(e, (d + 1) * Day)))
      }.filter(t => t._2 < t._3).groupBy(_._1)
      val wantIdle = byDay.values.map { ivs =>
        val lo = ivs.map(_._2).min; val hi = ivs.map(_._3).max
        (hi - lo) - naiveUnionOf(ivs.map(t => (t._2, t._3)))
      }.sum
      assert(idle == wantIdle, s"key $k: idle must equal active-span minus covered, day-wise")
      assert(nGaps == nBlocks - byDay.size, s"key $k: gaps = blocks - active days")
    }
  }

  private def naiveUnionOf(ivs: Seq[(Long, Long)]): Long = naiveUnion(ivs)

  test("intersection closes the algebra: |A|+|B|-|A∪B| = |A∩B| on interval soup") {
    val a = soup("a", 3) ++ soup("b", 7)
    val b = soup("a", 13) ++ soup("b", 17)
    val dfA = a.toDF("k", "s_us", "e_us")
    val dfB = b.toDF("k", "s_us", "e_us")
    val mA = IntervalCoverage.coverageOf(dfA, "k")
      .select("k", "covered_us").as[(String, Long)].collect().toMap
    val mB = IntervalCoverage.coverageOf(dfB, "k")
      .select("k", "covered_us").as[(String, Long)].collect().toMap
    val mU = IntervalCoverage.coverageOf(dfA.unionByName(dfB), "k")
      .select("k", "covered_us").as[(String, Long)].collect().toMap
    val mI = IntervalCoverage.intersectionOf(dfA, dfB, "k")
      .select("k", "both_us").as[(String, Long)].collect().toMap
    Seq("a", "b").foreach { k =>
      assert(mI(k) == mA(k) + mB(k) - mU(k), s"inclusion-exclusion broke on $k")
      assert(mI(k) > 0, s"soup keys should genuinely intersect ($k)")
    }
  }

  test("registered type-coverage query: sane bounds at sf0.001") {
    val out = IntervalCoverage.typeCoverage(spark, TestSpark.Sf0001)
      .select("event_type", "covered_us", "n_day_blocks", "max_block_us")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, cov, nb, mx) => cov > 0 && nb > 0 && mx <= cov && mx <= Day })
  }
}
