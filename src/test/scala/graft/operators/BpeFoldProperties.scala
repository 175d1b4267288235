package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property check of the BPE merge-apply fold — the subtlest expression
  * in the tokenizer ring (a left fold whose "replace the accumulator's
  * tail" branch encodes greedy left-to-right non-overlapping merging).
  * The example specs pin real-corpus behavior; these drive the fold
  * through arbitrary words and merge lists, including the adversarial
  * repeated-symbol cases (aaa + (a,a)) where naive implementations
  * over-merge.
  *
  * Reference semantics (the driver-side model every spec shares): scan
  * left to right; if the previous UNCONSUMED symbol equals `a` and the
  * current equals `b`, replace them with `ab` — the merged token then
  * participates as a single symbol for later pairs of the SAME pass.
  */
object BpeFoldProperties extends Properties("BpeFold") {
  private lazy val spark = TestSpark.spark

  // each sample is a (tiny) Spark job; 25 samples x 4 properties keeps
  // the suite under a minute while still walking the space
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val alpha = Gen.oneOf("a", "b", "c")
  private val genWord: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString)
  private val genMerges: Gen[List[(String, String)]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, for {
      a <- alpha; b <- alpha
    } yield (a, b)))

  /** Driver-side model of one merge pass (identical to the spec model). */
  private def refApply(syms: List[String], a: String, b: String): List[String] = {
    val m = scala.collection.mutable.ListBuffer.empty[String]
    syms.foreach { s =>
      if (m.nonEmpty && m.last == a && s == b) m(m.length - 1) = a + b
      else m += s
    }
    m.toList
  }

  private def engineFold(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val df = words.toDF("word")
      .withColumn("syms", filter(split(col("word"), ""), c => c =!= ""))
    CorpusQueries.foldMerges(df, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
  }

  property("fold equals the reference model for arbitrary words and merges") =
    Prop.forAll(Gen.listOfN(8, genWord), genMerges) { (words, merges) =>
      val got = engineFold(words.distinct, merges)
      words.distinct.forall { w =>
        val want = merges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
          case (syms, (a, b)) => refApply(syms, a, b)
        }
        got(w) == want
      }
    }

  property("concatenation always reconstructs the word") =
    Prop.forAll(Gen.listOfN(8, genWord), genMerges) { (words, merges) =>
      engineFold(words.distinct, merges).forall { case (w, syms) => syms.mkString == w }
    }

  property("greedy non-overlap: aaa-style runs merge floor(n/2) times") =
    Prop.forAll(Gen.choose(1, 9)) { n =>
      val w = "a" * n
      val syms = engineFold(Seq(w), Seq("a" -> "a"))(w)
      syms.count(_ == "aa") == n / 2 && syms.mkString == w
    }

  property("re-applying the same merge is a no-op (merged token shields its halves)") =
    Prop.forAll(Gen.listOfN(6, genWord), for { a <- alpha; b <- alpha } yield (a, b)) {
      (words, m) =>
        val once = engineFold(words.distinct, Seq(m))
        val twice = engineFold(words.distinct, Seq(m, m))
        words.distinct.forall(w => once(w) == twice(w))
    }
}
