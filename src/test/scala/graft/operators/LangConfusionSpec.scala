package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Language-ID confusion matrix pinned against a full driver recompute of
  * the marker-scoring classifier (whitespace tokens, marker membership
  * counts, CJK codepoint census, the documented argmax tie chain) — plus
  * the mass-conservation invariants that make a confusion matrix a
  * partition of the corpus. */
class LangConfusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private val markers = Map(
    "en" -> Set("the", "a", "and"),
    "de" -> Set("der", "die", "das"),
    "es" -> Set("el", "la", "los"),
    "fr" -> Set("le", "les", "des"))

  private def predict(text: String): String = {
    val ws = text.split("\\s+").filter(_.nonEmpty)
    def s(lang: String) = ws.count(markers(lang)).toLong
    val (en, de, es, fr) = (s("en"), s("de"), s("es"), s("fr"))
    val cjk = text.count(c => c >= '一' && c <= '鿿').toLong
    if (cjk * 5 >= en + de + es + fr + 1) "zh"
    else if (en >= de && en >= es && en >= fr) "en"
    else if (de >= es && de >= fr) "de"
    else if (es >= fr) "es"
    else "fr"
  }

  test("confusion matrix matches the driver reclassification of every doc") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy { case (lang, text) => (lang, predict(text)) }
      .map { case (k, g) => (k._1, k._2, g.size.toLong) }.toSeq.sorted
    val got = TextQueries.queries("text_langid_confusion").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // the matrix partitions the corpus: cell mass sums to the doc count
    assert(got.map(_._3).sum == docs.length.toLong)
    // and it is the groupBy of the registered per-doc view (no drift
    // between the classifier's own output and its evaluation)
    val perDoc = TextQueries.queries("text_lang_id").fn(spark, dir)
      .select("actual_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, g) => (k._1, k._2, g.size.toLong) }.toSeq.sorted
    assert(perDoc == got)
  }
}
