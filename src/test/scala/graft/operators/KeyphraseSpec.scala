package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RAKE keyphrases pinned against a full plain-Scala recompute: phrase
  * runs, the deg/freq word statistics, ppm scores, and the final top-50
  * ordering must all agree bit-for-bit with the distributed plan. */
class KeyphraseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val stop = Set("the", "a", "of", "to", "and", "in", "is", "for")
  private def isBreak(t: String) = stop(t) || t.exists(c => !(c.isDigit || (c >= 'a' && c <= 'z')))

  test("RAKE scores match a driver recompute at sf0.001") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    // phrase occurrences: maximal non-break runs, capped at 6 tokens
    val occ = docs.flatMap { text =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.newBuilder[String]
      var n = 0
      toks.foreach { t =>
        if (isBreak(t)) { if (n > 0) runs += cur.result(); cur = List.newBuilder; n = 0 }
        else { cur += t; n += 1 }
      }
      if (n > 0) runs += cur.result()
      runs.filter(_.size <= 6)
    }
    val freq = occ.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = occ.flatMap(p => p.map(w => w -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wscore = freq.keys.map(w => w -> (BigInt(deg(w)) * 1000000 / freq(w)).toLong).toMap
    val expect = occ.map(p => p.mkString(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (phrase, nOcc) =>
        (phrase, nOcc, phrase.split(" ").map(wscore).sum)
      }.toSeq
      .sortBy { case (p, n, s) => (-s, -n, p) }.take(50)
    val got = TextQueries.keyphrases(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect && got.nonEmpty)
  }
}
