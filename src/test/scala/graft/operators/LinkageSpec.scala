package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The segment join's candidate generation must be COMPLETE: the
  * pigeonhole argument says any pair within edit distance 2 shares an
  * unedited segment in the ±2 window. The oracle proves it on the
  * catalog; this spec attacks it with adversarial synthetic edits —
  * every deterministic 1- and 2-edit variant family must be recovered. */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("sorted neighborhood: window pairs + verify match a driver recompute; complementary to token blocking") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val names = graft.sources.Tables(TestSpark.Sf0001).part
      .groupBy("p_name").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = names.groupBy(_._1.split(" ").head).values.flatMap { blk =>
      val sorted = blk.map(_._1).distinct.sorted
      val counts = blk.toMap
      for {
        i <- sorted.indices; j <- i + 1 until math.min(i + 5, sorted.length)
        d = lev(sorted(i), sorted(j)) if d <= 3
      } yield (sorted(i), sorted(j), (j - i).toLong, d.toLong,
        counts(sorted(i)), counts(sorted(j)))
    }.toSet
    val got = Linkage.queries("link_sorted_neighborhood").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want && got.nonEmpty)
    // complementarity: SNM keeps pairs whose SECOND token differs, which
    // second-token blocking (link_fuzzy_parts) is structurally blind to
    val fuzzy = Linkage.queries("link_fuzzy_parts").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val snmOnly = got.map(p => (p._1, p._2)).diff(fuzzy)
    assert(snmOnly.nonEmpty, "SNM should surface pairs token blocking misses")
    snmOnly.foreach { case (a, b) =>
      assert(a.split(" ")(1) != b.split(" ")(1)) }
  }

  test("multi-column records share one edit budget across fields") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val recs = Seq(
      ("johann", "meier"), ("johan", "meier"),   // 1 edit, field 1
      ("johann", "meyer"),                        // 1 edit, field 2
      ("johan", "meyer"),                         // 1+1 edits across fields
      ("johann", "mairer"),                       // 2 edits, field 2
      ("jxhxnn", "meier"),                        // 2 edits, field 1
      ("joxann", "mxier"), ("totally", "other"))  // 1+1 vs base; unrelated
      .toDF("first", "last")
    val pairs = Linkage.fuzzyRecords(recs, Seq("first", "last"))
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def key(f: String, l: String) = f + "" + l
    // within budget: found
    assert(pairs.contains((key("johan", "meier"), key("johann", "meier"))))
    assert(pairs.contains((key("johann", "meier"), key("johann", "meyer"))))
    assert(pairs.contains((key("johan", "meyer"), key("johann", "meier")) )
      || pairs.contains((key("johann", "meier"), key("johan", "meyer"))))
    assert(pairs.exists(p => p._1.contains("jxhxnn") || p._2.contains("jxhxnn")))
    // beyond budget: the unrelated record pairs with nothing
    assert(!pairs.exists(p => p._1.contains("totally") || p._2.contains("totally")))
    // the separator makes boundary crossings COST edits instead of being
    // free: ("johannme","ier") vs ("johann","meier") concatenate to the
    // same characters, so without a separator they'd match at distance 0;
    // with it, shifting two chars across the field boundary costs 2
    val bleed = Seq(("johannme", "ier"), ("johann", "meier")).toDF("first", "last")
    val bp = Linkage.fuzzyRecords(bleed, Seq("first", "last"))
      .select("dist").collect().map(_.getLong(0)).toSeq
    assert(bp == Seq(2L), s"boundary shift must cost its edits, got $bp")
  }

  test("threshold-3 segment join recovers every pair within distance 3") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val bases = Seq("alpha widget", "industrial bolt", "aquamarine housing")
    def subs(t: String, i: Int) = t.updated(i, if (t(i) == 'z') 'q' else 'z')
    // 0..3 stacked substitutions at spread positions
    val variants = bases.flatMap { b =>
      Seq(b, subs(b, 0), subs(subs(b, 0), b.length / 2),
        subs(subs(subs(b, 0), b.length / 2), b.length - 1))
    }.distinct
    val names = variants.toDF("nm")
      .withColumn("n_parts", org.apache.spark.sql.functions.lit(1L))
    val got = Linkage.segmentPairs(names, k = 3)
      .select("name_a", "name_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      a <- variants; b <- variants if a < b
      d = lev(a, b) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(want.exists(_._3 == 3) && got == want,
      s"missed: ${(want -- got).take(5)}; extra: ${(got -- want).take(5)}")
  }

  test("segment candidates recover every pair within distance 2 (adversarial edits)") {
    val bases = Seq("alpha widget", "industrial bolt", "ze rod", "connector",
      "aquamarine housing", "xy", "abcdefghijklmnop")
    // deterministic edit families: substitutions, deletions, insertions at
    // every position, singly and doubled at far-apart positions
    def subs(s: String) = s.indices.map(i => s.updated(i, if (s(i) == 'z') 'q' else 'z'))
    def dels(s: String) = s.indices.map(i => s.take(i) + s.drop(i + 1))
    def ins(s: String) = (0 to s.length).map(i => s.take(i) + "#" + s.drop(i))
    val variants = bases.flatMap { b =>
      val one = subs(b) ++ dels(b) ++ ins(b)
      val two = for (v <- Seq(subs(b).headOption, dels(b).lastOption, ins(b).headOption).flatten;
                     w <- Seq(subs(v).lastOption, ins(v).lastOption).flatten) yield w
      (b +: (one ++ two)).distinct
    }.distinct.filter(_.length >= 3)

    val names = variants.toDF("nm").withColumn("n_parts", org.apache.spark.sql.functions.lit(1L))
    val got = Linkage.segmentPairs(names)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // naive truth over the full cross product
    val want = (for {
      a <- variants; b <- variants if a < b && math.abs(a.length - b.length) <= 2
      if lev(a, b) <= 2
    } yield (a, b)).toSet
    assert(want.nonEmpty && want.size > 100)
    val missed = want -- got
    assert(missed.isEmpty, s"segment join missed ${missed.size} true pairs, e.g. ${missed.take(5)}")
    assert(got == want) // and no false positives survive verification
  }
}
