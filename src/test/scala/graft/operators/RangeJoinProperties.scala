package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property check of the binned range join against the quadratic oracle:
  * random interval sets, random bin widths — same pair set, no
  * duplicates. (The example-based spec pins fixed geometries; this
  * drives the dedupe-by-attribution arithmetic through arbitrary
  * boundary alignments.) */
object RangeJoinProperties extends Properties("RangeJoin") {
  private lazy val spark = TestSpark.spark

  private val genIntervals: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    ivs <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 300L)
      len <- Gen.choose(0L, 120L)
    } yield (s, s + len))
  } yield ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }

  private val genWidth: Gen[Long] = Gen.oneOf(1L, 3L, 16L, 50L, 999L)

  property("pair set equals the quadratic oracle, each pair once") =
    Prop.forAll(genIntervals, genWidth) { (ivals, width) =>
      import spark.implicits._
      val a = ivals.toDF("a_id", "a_start", "a_end")
      val b = ivals.toDF("b_id", "b_start", "b_end")
      val got = RangeJoin.overlapPairs(a, "a_start", "a_end", b, "b_start", "b_end", width)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val naive = (for {
        (ia, sa, ea) <- ivals; (ib, sb, eb) <- ivals
        if ia < ib && sa <= eb && sb <= ea
      } yield (ia, ib)).toSet
      got.size == got.distinct.size && got.toSet == naive
    }
}
