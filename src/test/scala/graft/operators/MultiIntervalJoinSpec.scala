package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-interval range join vs the naive nested-loop oracle: a pair is
  * emitted iff ANY interval of one row overlaps ANY interval of the
  * other, exactly once, at bin widths smaller and larger than the
  * intervals — without pre-exploding payloads. */
class MultiIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic interval-SET soup: 1..5 intervals per row, varying
  // lengths/gaps, some sets internally overlapping, some spanning many
  // bins, some sharing exact boundaries across rows
  private lazy val rows: Seq[(Long, Seq[(Long, Long)])] = (1L to 60L).map { i =>
    val k = 1 + (i % 5).toInt
    val ivs = (0 until k).map { j =>
      val s = (i * 37L + j * 101L) % 600L
      (s, s + (i * 13L + j * 7L) % 80L)
    }
    (i, ivs)
  }

  private def anyOverlap(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Boolean =
    a.exists { case (sa, ea) => b.exists { case (sb, eb) => sa <= eb && sb <= ea } }

  private def naive: Set[(Long, Long)] = (for {
    (ia, iva) <- rows; (ib, ivb) <- rows
    if ia < ib && anyOverlap(iva, ivb)
  } yield (ia, ib)).toSet

  private def df(idCol: String, ivsCol: String) = rows
    .toDF(idCol, "_raw")
    .withColumn(ivsCol, expr("transform(_raw, x -> named_struct('s', x._1, 'e', x._2))"))
    .drop("_raw")

  test("pair set matches the naive any-overlap oracle, exactly once, any bin width") {
    val a = df("a_id", "a_ivs")
    val b = df("b_id", "b_ivs")
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = MultiIntervalJoin.overlapPairsMulti(a, "a_ivs", b, "b_ivs", width)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size, s"width $width: duplicate pairs emitted")
      assert(got.toSet == naive, s"width $width: pair set diverges from naive oracle")
    }
  }

  test("payload passes through; working names collide safely with caller columns") {
    // caller columns deliberately named like the old fixed temp names
    val a = df("a_id", "a_ivs").withColumn("_bin", col("a_id") * 100)
      .withColumn("_livs", lit("keep-l"))
    val b = df("b_id", "b_ivs").withColumn("_rbin", col("b_id") * 200)
      .withColumn("_rivs", lit("keep-r"))
    val out = MultiIntervalJoin.overlapPairsMulti(a, "a_ivs", b, "b_ivs", 64L)
      .where(col("a_id") < col("b_id"))
    assert(out.columns.toSet ==
      Set("a_id", "a_ivs", "_bin", "_livs", "b_id", "b_ivs", "_rbin", "_rivs"))
    val r = out.select("a_id", "_bin", "_livs", "b_id", "_rbin", "_rivs")
      .as[(Long, Long, String, Long, Long, String)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (aid, bin, ls, bid, rbin, rs) =>
      bin == aid * 100 && rbin == bid * 200 && ls == "keep-l" && rs == "keep-r"
    }, "caller columns must pass through untouched")
  }

  test("keyed two-phase variant: same pair set as one-phase, payload passes through") {
    val a = df("a_id", "a_ivs")
    val b = df("b_id", "b_ivs").withColumn("b_tag", col("b_id") * 7)
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = MultiIntervalJoin.overlapPairsMultiKeyed(a, "a_ivs", "a_id", b, "b_ivs", "b_id", width)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id", "b_tag").as[(Long, Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size, s"width $width: duplicate pairs emitted")
      assert(got.map(t => (t._1, t._2)).toSet == naive, s"width $width: diverges from naive oracle")
      assert(got.forall(t => t._3 == t._2 * 7), "payload must pass through the rejoin")
    }
  }

  test("whale-bin cap: deterministic undercount, monotone in cap, exact when cap covers occupancy") {
    val a = df("a_id", "a_ivs")
    val b = df("b_id", "b_ivs")
    def capped(cap: Int): Set[(Long, Long)] =
      MultiIntervalJoin.overlapPairsMultiCapped(a, "a_ivs", "a_id", b, "b_ivs", "b_id", 64L, cap)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val full = naive
    val c4 = capped(4)
    val c16 = capped(16)
    assert(c4.subsetOf(c16) && c16.subsetOf(full), "cap must be monotone and never invent pairs")
    assert(c4.size < full.size, "cap=4 on 60 interval-set rows must actually drop pairs")
    assert(capped(rows.size) == full, "cap beyond any bin's occupancy recovers exactness")
  }

  test("disjoint sets emit nothing; touching endpoints count (inclusive)") {
    def one(id: Long, ivs: Seq[(Long, Long)], idc: String, ivc: String) =
      Seq((id, ivs)).toDF(idc, "_raw")
        .withColumn(ivc, expr("transform(_raw, x -> named_struct('s', x._1, 'e', x._2))"))
        .drop("_raw")
    val a = one(1L, Seq((0L, 10L), (50L, 60L)), "a_id", "a_ivs")
    val far = one(2L, Seq((20L, 30L), (80L, 90L)), "b_id", "b_ivs")
    assert(MultiIntervalJoin.overlapPairsMulti(a, "a_ivs", far, "b_ivs", 8L).count() == 0)
    val touch = one(2L, Seq((60L, 70L)), "b_id", "b_ivs")
    assert(MultiIntervalJoin.overlapPairsMulti(a, "a_ivs", touch, "b_ivs", 8L).count() == 1)
  }

  test("keyed whale-bin cap: deterministic undercount, monotone, exact when cap covers occupancy") {
    val a = df("a_id", "a_ivs")
    val b = df("b_id", "b_ivs")
    def capped(cap: Int): Set[(Long, Long)] =
      MultiIntervalJoin.overlapPairsMultiKeyedCapped(a, "a_ivs", "a_id", b, "b_ivs", "b_id", 64L, cap)
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val full = naive
    val c3 = capped(3)
    val c12 = capped(12)
    assert(c3.subsetOf(c12) && c12.subsetOf(full), "cap must be monotone and never invent pairs")
    assert(c3.size < full.size, "cap=3 must actually drop pairs")
    assert(capped(rows.size) == full, "cap beyond any bin's occupancy recovers exactness")
  }

  test("interval overlap-count kernel matches the quadratic lambda formulation") {
    graft.plans.VectorExpressions.register(spark)
    // sort right side: the kernel's contract (sort_array build order)
    val a = df("a_id", "a_ivs")
    val b = df("b_id", "b_ivs").withColumn("b_ivs", sort_array(col("b_ivs")))
    val both = a.crossJoin(b).select(
      graft.plans.VectorExpressions.intervalOverlapCount(col("a_ivs"), col("b_ivs")).as("fast"),
      expr("""CAST(size(filter(
        flatten(transform(a_ivs, x -> transform(b_ivs, y ->
          x.s <= y.e AND y.s <= x.e))), z -> z)) AS BIGINT)""").as("naive"))
      .as[(Long, Long)].collect()
    assert(both.length == rows.size * rows.size)
    assert(both.forall { case (f, nv) => f == nv }, "kernel must equal the n*m lambda count")
    // empty side → 0
    val e = Seq((1L, Seq.empty[(Long, Long)])).toDF("a_id", "_raw")
      .withColumn("a_ivs", expr("transform(_raw, x -> named_struct('s', x._1, 'e', x._2))"))
    val z = e.crossJoin(b.limit(3))
      .select(graft.plans.VectorExpressions.intervalOverlapCount(col("a_ivs"), col("b_ivs")))
      .as[Long].collect()
    assert(z.forall(_ == 0L))
  }

  test("registered overlapping-stays query returns sane user pairs at sf0.001") {
    val out = MultiIntervalJoin.overlappingStays(spark, TestSpark.Sf0001)
    val r = out.select("a_user", "b_user", "n_overlap_pairs")
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (a, b, n) => a < b && n >= 1 })
    assert(r.map(p => (p._1, p._2)).distinct.length == r.length, "one row per user pair")
  }
}
