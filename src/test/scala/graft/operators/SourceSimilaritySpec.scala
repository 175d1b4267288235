package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Source-level union-sketch similarity pinned two ways: the exact
  * pairwise shingle-set Jaccard matches a driver recompute, and the
  * signature is a true UNION sketch — the per-source component must equal
  * the min over the per-doc components (the mergeability that lets a
  * 100 TB run land per-file signatures and fold them). */
class SourceSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(text: String): Seq[String] = {
    val w = text.split("\\s+").filter(_.nonEmpty).toSeq
    if (w.size >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq(w.mkString(" "))
  }

  test("exact Jaccard matches a driver recompute and the estimate tracks it") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(d => shingles(d._2)).toSet
    }
    val srcs = sets.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      sa = sets(a); sb = sets(b)
      inter = (sa & sb).size.toLong
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter,
      inter * 1000000L / (sa.size + sb.size - inter))).sortBy(t => (t._1, t._2))

    val got = DedupQueries.sourceSimilarity(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) == expect)
    // K=12 quantizes the estimate to 1/12 steps (σ ≈ 0.14 worst case);
    // the corpus is fixed, so the deterministic deviation is pinned at
    // ≤ 2 components (measured 0.146 max at sf0.001 and sf0.01)
    got.foreach { t =>
      assert(math.abs(t._7 - t._6) <= 2 * 1000000L / 12,
        s"${t._1}x${t._2}: est ${t._7} vs exact ${t._6}")
    }
  }

  test("the source signature is the min-merge of its docs' signatures") {
    import spark.implicits._
    val one = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .where($"source" === "src0").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // driver: per-doc minhash components, then min across docs
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val P = 2147483647L
    def mixA(i: Int): Long = Math.floorMod(2654435761L * (i + 1), 1L << 30) | 1L
    def mixB(i: Int): Long = Math.floorMod(1103515245L * (i + 7), 1L << 30)
    def sig(sh: Set[String]): Seq[Long] = {
      val hs = sh.toSeq.map(s => java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16))
      (0 until 12).map(i => hs.map(h => (mixA(i) * h + mixB(i)) % P).min)
    }
    val perDoc = one.map(d => sig(shingles(d._2).toSet))
    val merged = (0 until 12).map(i => perDoc.map(_(i)).min)
    val union = sig(one.flatMap(d => shingles(d._2)).toSet)
    assert(merged == union)
  }
}
