package graft.pipeline

import graft.TestSpark
import graft.functions.TextFunctions.words
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three properties that make the CMS layer sound: per-grain
  * sketches merge EXACTLY to the global sketch (counters, not estimates),
  * estimates never undercount, and true heavy hitters survive the blur. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val tokens = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.sources.Tables(TestSpark.Sf0001).documents
      .select(col("source"), explode(words(col("text"))).as("tok"))
      .cache()
  }
  private val cfg = CountMin.Config(depth = 4, width = 2048)

  test("per-source sketches merge exactly to the one-shot global sketch") {
    val perSource = CountMin.build(tokens, col("tok"), col("source"), cfg)
    val merged = CountMin.merge(perSource)
      .as[(Int, Int, Long)].collect().toSet
    val global = CountMin.merge(
        CountMin.build(tokens, col("tok"), lit("all"), cfg))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == global && merged.nonEmpty)
  }

  test("estimates never undercount, overestimate stays within the epsilon-N bound") {
    val truth = tokens.groupBy(col("tok").as("key")).agg(count(lit(1)).as("true_cnt"))
    val merged = CountMin.merge(CountMin.build(tokens, col("tok"), col("source"), cfg))
    val est = CountMin.estimate(merged, truth.select("key"), cfg)
    val joined = est.join(truth, Seq("key"))
      .select(col("key"), col("est"), col("true_cnt"))
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    assert(joined.forall { case (_, e, t) => e >= t }, "CMS must never undercount")
    val n = tokens.count()
    val epsN = math.ceil(math.E / cfg.width * n).toLong
    val worst = joined.map { case (_, e, t) => e - t }.max
    assert(worst <= epsN, s"worst overestimate $worst exceeds epsilon*N = $epsN")
    // an unseen key estimates 0 on this sketch (no row collides everywhere)
    val unseen = CountMin.estimate(merged, Seq("zzz_never_a_token_zzz").toDF("key"), cfg)
      .as[(String, Long)].collect().head._2
    assert(unseen <= epsN)
  }

  test("true top-10 heavy hitters all appear in the estimated top-15") {
    val truth = tokens.groupBy(col("tok").as("key")).agg(count(lit(1)).as("true_cnt"))
    val top10 = truth.orderBy(col("true_cnt").desc, col("key")).limit(10)
      .select("key").as[String].collect().toSet
    val merged = CountMin.merge(CountMin.build(tokens, col("tok"), col("source"), cfg))
    val estTop15 = CountMin.estimate(merged, truth.select("key"), cfg)
      .orderBy(col("est").desc, col("key")).limit(15)
      .select("key").as[String].collect().toSet
    assert(top10.subsetOf(estTop15), s"missing hitters: ${top10 -- estTop15}")
  }

  test("join-size estimate never undercounts and tightens with width") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = graft.sources.Tables(TestSpark.Sf0001).documents
    // two overlapping key streams: doc langs of two disjoint source halves
    val a = docs.where(col("source") <= "src12").select(col("lang").as("k"))
    val b = docs.where(col("source") > "src12").select(col("lang").as("k"))
    val exact = a.join(b, "k").count()
    def est(width: Int): Long = {
      val c = CountMin.Config(depth = 4, width = width)
      CountMin.joinSize(
        CountMin.merge(CountMin.build(a, col("k"), lit(0), c)),
        CountMin.merge(CountMin.build(b, col("k"), lit(0), c)))
        .collect().head.getLong(0)
    }
    val (narrow, wide) = (est(8), est(4096))
    assert(narrow >= exact && wide >= exact)
    assert(wide <= narrow)
    // width far beyond the key cardinality (|langs| ≈ 4): exact inner product
    assert(wide == exact)
  }
}
