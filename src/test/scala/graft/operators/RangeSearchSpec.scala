package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** IVF range search pinned three ways: the threshold is respected, the
  * top-k twin's thresholded rows are a subset (same pruning ⇒ same
  * candidate pool), and the full pair set matches a driver recompute of
  * the IVF assignment + radius filter — with an explicit guard that no
  * pair sits within float noise of the threshold boundary, so the
  * recompute comparison is well-posed. */
class RangeSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  test("range rows respect the threshold and contain the thresholded top-k") {
    val range = AnnQueries.queries("ann_ivf_range").fn(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(range.forall(_._2 >= 0.35))
    val topk = AnnQueries.queries("ann_ivf_topk").fn(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
      .filter(_._2 >= 0.35)
    val rangeSet = range.map(_._1).toSet
    assert(topk.nonEmpty && topk.forall { case (pair, _) => rangeSet(pair) })
  }

  test("pair set matches a driver recompute of assignment + radius") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val cents = vecs.filter(_._1 < 8).toSeq.sortBy(_._1).map(_._2)
    def centCos(v: Array[Float]) = cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
    // corpus: nearest centroid, ties to the smaller id
    val cluster = vecs.map { case (id, v) =>
      id -> centCos(v).maxBy { case (c, i) => (c, -i) }._2
    }
    // probes: two nearest centroids
    val expect = vecs.keys.filter(_ % 50 == 0).flatMap { pid =>
      val probed = centCos(vecs(pid)).sortBy { case (c, i) => (-c, i) }.take(2).map(_._2).toSet
      vecs.keys.filter(id => id != pid && probed(cluster(id)))
        .map(id => ((pid, id), BigDecimal(cos(vecs(pid), vecs(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .filter(_._2 >= 0.35)
    }.toMap
    // well-posedness: nothing within float noise of the radius boundary
    assert(expect.values.forall(c => (c - 0.35).abs > 2e-6 || c >= 0.35))
    val got = AnnQueries.queries("ann_ivf_range").fn(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
  }
}
