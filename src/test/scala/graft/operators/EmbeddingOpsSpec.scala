package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  import spark.implicits._

  private def vecsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Float]] =
    df.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap

  test("normalized embeddings have unit L2 norm and preserve direction") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val raw = vecsOf(graft.sources.Tables(dir).embeddings)
    val unit = vecsOf(EmbeddingOps.normalized(graft.sources.Tables(dir).embeddings))
    assert(unit.nonEmpty && unit.keySet == raw.keySet)
    unit.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"vec $id norm $n")
      // same direction: cosine with the raw vector is 1
      val r = raw(id)
      val dot = v.zip(r).map { case (a, b) => a.toDouble * b }.sum
      val rn = math.sqrt(r.map(x => x.toDouble * x).sum)
      assert(math.abs(dot / rn - 1.0) < 1e-4)
    }
  }

  test("full-rank PCA is a rigid rotation: pairwise distances survive exactly") {
    val dim = vecsOf(graft.sources.Tables(dir)(spark).embeddings).head._2.length
    val full = vecsOf(EmbeddingOps.pcaProject(spark, dir, dim))
    val raw = vecsOf(graft.sources.Tables(dir)(spark).embeddings)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val ids = raw.keys.toSeq.sorted.take(30)
    for (i <- ids; j <- ids if i < j) {
      val orig = d2(raw(i), raw(j))
      val proj = d2(full(i), full(j))
      assert(math.abs(orig - proj) <= 1e-3 * math.max(1.0, orig),
        s"distance $i-$j moved: $orig -> $proj")
    }
  }

  test("truncation error shrinks as k grows; projected ANN recall holds its measured floor") {
    val raw = vecsOf(graft.sources.Tables(dir)(spark).embeddings)
    val dim = raw.head._2.length
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    // distance distortion at k vs full rank, averaged over a fixed pair set
    def distortion(k: Int): Double = {
      val p = vecsOf(EmbeddingOps.pcaProject(spark, dir, k))
      val ids = raw.keys.toSeq.sorted.take(25)
      val pairs = for (i <- ids; j <- ids if i < j) yield (i, j)
      pairs.map { case (i, j) => math.abs(d2(raw(i), raw(j)) - d2(p(i), p(j))) }.sum / pairs.size
    }
    val d16 = distortion(16)
    val d64 = distortion(64)
    assert(d64 < d16, s"more components must distort less: k=64 $d64 vs k=16 $d16")

    // ANN in 32-dim PCA space vs exact full-dim cosine top-5
    val p32 = vecsOf(EmbeddingOps.pcaProject(spark, dir, 32))
    def cos(a: Array[Float], b: Array[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def top5(space: Map[Long, Array[Float]], probe: Long): Set[Long] =
      space.filter(_._1 != probe).toSeq
        .sortBy { case (id, v) => (-cos(space(probe), v), id) }.take(5).map(_._1).toSet
    val probes = raw.keys.toSeq.sorted.filter(_ % 50 == 0)
    val recalls = probes.map(p => (top5(p32, p) & top5(raw, p)).size / 5.0)
    val recall = recalls.sum / recalls.size
    // floor pinned below the observed value so regressions fail loudly
    assert(recall >= 0.4, s"PCA-32 recall@5 collapsed to $recall")
  }
}
