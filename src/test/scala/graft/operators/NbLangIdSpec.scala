package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Naive-Bayes language ID pinned against a full driver recompute of the
  * training counts, the micro-nat log-likelihood rounding, the Laplace
  * smoothing, and the per-document argmax. */
class NbLangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def micro(x: Double): Long =
    BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("confusion matrix matches the driver NB pipeline") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tok = docs.flatMap { case (id, lang, text) =>
      text.split("\\s+").filter(_.nonEmpty).map(w => (id, lang, w))
    }
    val vocab = tok.map(_._3).distinct.length
    val nDocs = docs.length.toLong
    val docsC = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val nC = tok.groupBy(_._2).map { case (l, t) => l -> t.length.toLong }
    val classes = docsC.keys.toSeq.sorted
    val priorU = classes.map(c => c -> micro(math.log(docsC(c).toDouble / nDocs))).toMap
    val llr0U = classes.map(c => c -> micro(math.log(1.0 / (nC(c) + vocab)))).toMap
    val nWc = tok.groupBy(t => (t._3, t._2)).map { case (k, ts) => k -> ts.length.toLong }
    def llrU(w: String, c: String): Long = nWc.get((w, c))
      .map(n => micro(math.log((n + 1).toDouble / (nC(c) + vocab))))
      .getOrElse(llr0U(c))

    val preds = tok.groupBy(_._1).toSeq.map { case (id, ts) =>
      val lang = ts.head._2
      val counts = ts.groupBy(_._3).map { case (w, xs) => w -> xs.length.toLong }
      val best = classes.map { c =>
        (counts.map { case (w, n) => n * llrU(w, c) }.sum + priorU(c), c)
      }.minBy { case (s, c) => (-s, c) }._2
      (lang, best)
    }
    val expect = preds.groupBy(identity).map { case ((a, p), xs) =>
      (a, p, xs.size.toLong)
    }.toSeq.sortBy(t => (t._1, t._2))

    val got = TextQueries.nbLangId(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
    // every document is classified exactly once
    assert(got.map(_._3).sum == nDocs)
  }
}
