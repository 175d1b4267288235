package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("w", words(col("text")))

  test("words: splits on whitespace runs, drops empty edge tokens") {
    val out = df("  a  b\tc \n").select(col("w")).head().getSeq[String](0)
    assert(out == Seq("a", "b", "c"))
  }

  test("shingles: 3-grams, short texts fall back to the whole text") {
    val out = df("one two three four").withColumn("s", shingles("w"))
      .select("s").head().getSeq[String](0)
    assert(out == Seq("one two three", "two three four"))
    val short = df("just two").withColumn("s", shingles("w"))
      .select("s").head().getSeq[String](0)
    assert(short == Seq("just two"))
  }

  test("fingerprint: stable min-of-shingle-md5s; permutation-sensitive") {
    val d = df("alpha beta gamma delta", "alpha beta gamma delta", "delta gamma beta alpha")
      .withColumn("f", fingerprint(shingles("w")))
    val fs = d.orderBy("id").select("f").as[String].collect()
    assert(fs(0) == fs(1)) // identical text → identical fingerprint
    assert(fs(0) != fs(2)) // different shingles → different fingerprint
    assert(fs(0).matches("[0-9a-f]{32}"))
  }

  test("minhash: seed changes the hash; identical sets collide") {
    val d = df("w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5")
      .withColumn("s", shingles("w"))
      .withColumn("m0", minhash(col("s"), lit(0)))
      .withColumn("m1", minhash(col("s"), lit(1)))
    val rows = d.select("m0", "m1").as[(String, String)].collect()
    assert(rows(0) == rows(1))       // same shingle set, same seeds
    assert(rows(0)._1 != rows(0)._2) // different seeds diverge
  }

  test("langId identifies real multilingual text (incl. CJK)") {
    import graft.operators.TextQueries
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog barked", "en"),
      (2L, "der Hund und die Katze spielen in das Haus der Familie", "de"),
      (3L, "el perro y la casa de los abuelos en el pueblo", "es"),
      (4L, "le chien et les chats dans des maisons le soir", "fr"),
      (5L, "我们在北京学习中文课程", "zh"),
    ).toDF("doc_id", "text", "lang")
    val pred = TextQueries.langIdFor(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("stopwordCount counts only listed tokens") {
    val n = df("the cat and the hat")
      .select(stopwordCount(col("w"), Seq("the", "and")).as("n"))
      .head().getInt(0)
    assert(n == 3)
  }

  test("redactPii: emails, IPs, phones replaced; ordinary prose untouched") {
    val rows = df(
      "contact bob.smith+x@corp.example.org or 10.0.42.7 or 555-867-5309 today",
      "version 1.2.3 of the lib costs 12.50 at pi 3.14159 no pii here",
      "two mails a@b.io c@d.net one ip 192.168.0.1").select(
      col("id"), redactPii(col("text")).as("red"), piiCounts(col("text")).as("c"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "contact [EMAIL] or [IP] or [PHONE] today")
    val c0 = rows(0).getStruct(2)
    assert((c0.getInt(0), c0.getInt(1), c0.getInt(2)) == ((1, 1, 1)))
    // dotted version / decimal / pi strings survive (word-boundary anchors,
    // 4-octet shape): nothing redacted, all counts zero
    assert(rows(1).getString(1).contains("1.2.3") && rows(1).getString(1).contains("3.14159"))
    val c1 = rows(1).getStruct(2)
    assert((c1.getInt(0), c1.getInt(1), c1.getInt(2)) == ((0, 0, 0)))
    val c2 = rows(2).getStruct(2)
    assert((c2.getInt(0), c2.getInt(1)) == ((2, 1)))
  }

  test("piiCounts never double-counts: an email host is not also an IP") {
    val r = df("mail me at a@10.0.0.1.example.com now")
      .select(piiCounts(col("text")).as("c")).head().getStruct(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == 0)
  }

  test("pii scan report aggregates crafted hits per source") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      ("a", "reach me at x@example.com or y@example.org"),
      ("a", "server at 10.0.0.1 answered"),
      ("a", "nothing sensitive here"),
      ("b", "call 555-123-4567 or 555-987-6543 from 192.168.0.1")
    ).toDF("source", "text")
    val got = graft.operators.TextQueries.piiScanOf(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("a") == ((3L, 2L, 2L, 1L, 0L)))
    assert(got("b") == ((1L, 1L, 0L, 1L, 2L)))
  }
}
