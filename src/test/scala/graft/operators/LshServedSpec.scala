package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r14: fixed-budget probed LSH serving — driver recompute. Rebuilds the
  * capped bucket index, the probe-side signatures + nearest-miss flips,
  * the candidate union and the exact-cosine top-k from COLLECTED
  * embeddings with plain Scala arithmetic (the same hyperplane pair
  * schedule, the same left-associative double chain), and pins the
  * query's output row-for-row. */
class LshServedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Bands = 8
  private val Rows = 8
  private val Cap = 16
  private val ProbeMod = 50
  private val TopK = 5
  private val Dim = 64

  private def pair(p: Int): (Int, Int) = {
    val i = (7 * p + 1) % Dim
    val j0 = (13 * p + 5) % Dim
    (i, if (j0 == i) (j0 + 1) % Dim else j0)
  }

  test("served top-k equals the capped probed recompute") {
    val emb = graft.sources.Tables(TestSpark.Sf0001)(spark).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bandHash(e: Array[Float], b: Int): Int =
      (0 until Rows).map { r =>
        val (i, j) = pair(b * Rows + r)
        if (e(i) > e(j)) 1 << r else 0
      }.sum
    def flipped(e: Array[Float], b: Int): Int = {
      val m = (0 until Rows).map { r =>
        val (i, j) = pair(b * Rows + r)
        math.abs(e(i).toDouble - e(j).toDouble)
      }
      val rStar = (0 until Rows - 1)
        .find(r => ((r + 1) until Rows).forall(t => m(r) <= m(t)))
        .getOrElse(Rows - 1)
      bandHash(e, b) ^ (1 << rStar)
    }
    // capped index: per (band, hash) the Cap lowest vec_ids
    val buckets = (for {
      (id, e) <- emb.toSeq
      b <- 0 until Bands
    } yield ((b, bandHash(e, b)), id))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.take(Cap) }
    def dot(a: Array[Float], b: Array[Float]): Double =
      (0 until Dim).foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def cos6(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (for (pid <- emb.keys.toSeq.sorted if pid % ProbeMod == 0) yield {
      val pe = emb(pid)
      val cands = (0 until Bands).flatMap { b =>
        buckets.getOrElse((b, bandHash(pe, b)), Nil) ++
          buckets.getOrElse((b, flipped(pe, b)), Nil)
      }.distinct.filter(_ != pid)
      cands.map(c => (pid, c, cos6(pe, emb(c))))
        .sortBy { case (_, c, s) => (-s, c) }.take(TopK)
        .zipWithIndex.map { case ((p, c, s), i) => (p, i + 1, c, s) }
    }).flatten
    val got = AnnQueries.queries("ann_lsh_served").fn(spark, TestSpark.Sf0001)
      .orderBy("probe_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    graft.operators.Cached.releaseAll()
    assert(got == want.map(t => (t._1, t._2.toLong, t._3, t._4)) && got.nonEmpty)
  }
}
