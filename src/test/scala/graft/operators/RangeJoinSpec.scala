package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join vs the naive cross-join oracle: same pair set, each
  * pair exactly once, at several bin widths (including widths far smaller
  * and far larger than the intervals). */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic interval soup: lengths and gaps vary, some intervals
  // span many bins, some share exact boundaries
  private lazy val ivals = (1L to 120L).map { i =>
    val start = (i * 37L) % 500L
    (i, start, start + (i * 13L) % 90L)
  }

  private def naive: Set[(Long, Long)] = (for {
    (ia, sa, ea) <- ivals; (ib, sb, eb) <- ivals
    if ia < ib && sa <= eb && sb <= ea
  } yield (ia, ib)).toSet

  test("pair set matches the naive oracle, each pair exactly once, any bin width") {
    val a = ivals.toDF("a_id", "a_start", "a_end")
    val b = ivals.toDF("b_id", "b_start", "b_end")
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.overlapPairs(a, "a_start", "a_end", b, "b_start", "b_end", width)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size, s"width $width: duplicate pairs emitted")
      assert(got.toSet == naive, s"width $width: pair set diverges from naive oracle")
    }
  }

  test("whale-bin cap: deterministic undercount, monotone in cap, exact when cap covers occupancy") {
    val a = ivals.toDF("a_id", "a_start", "a_end")
    val b = ivals.toDF("b_id", "b_start", "b_end")
    def capped(cap: Int): Set[(Long, Long)] =
      RangeJoin.overlapPairsCapped(a, "a_start", "a_end", "a_id",
          b, "b_start", "b_end", "b_id", 64L, cap)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val full = naive
    val c4 = capped(4)
    val c16 = capped(16)
    assert(c4.subsetOf(c16) && c16.subsetOf(full), "cap must be monotone and never invent pairs")
    assert(c4.size < full.size, "cap=4 on 120 intervals must actually drop pairs")
    // cap beyond any bin's occupancy recovers the exact result
    assert(capped(ivals.size) == full)
  }

  test("non-overlapping inputs produce nothing; touching endpoints count (inclusive)") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_start", "a_end")
    val far = Seq((2L, 100L, 110L)).toDF("b_id", "b_start", "b_end")
    assert(RangeJoin.overlapPairs(a, "a_start", "a_end", far, "b_start", "b_end", 8L).count() == 0)
    val touch = Seq((2L, 10L, 20L)).toDF("b_id", "b_start", "b_end")
    assert(RangeJoin.overlapPairs(a, "a_start", "a_end", touch, "b_start", "b_end", 8L).count() == 1)
  }
}
