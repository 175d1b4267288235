package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dataset split family: determinism, content-keyed co-assignment, and the
  * leakage/scrub contract (every scrubbed doc has a cross-split candidate
  * pair; every survivor has none). */
class SplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("assignment is deterministic and independent of partitioning") {
    val a = SplitQueries.splitAssign(spark, sf).orderBy("doc_id").collect()
    val b = SplitQueries.splitAssign(spark, sf).repartition(7).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("buckets are in range and every split is non-empty with train largest") {
    val rows = SplitQueries.splitAssign(spark, sf).collect()
    assert(rows.forall { r =>
      val bkt = r.getAs[Long]("bucket"); bkt >= 0 && bkt < 1000
    })
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("assignment is a pure function of document CONTENT (independent recompute)") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = graft.sources.Tables(sf)(spark).documents
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val bucket = java.lang.Long.parseLong(
          md5hex("graft-split-v1" + md5hex(text)).take(8), 16) % 1000
        val split = if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
        id -> ((bucket, split))
      }.toMap
    val got = SplitQueries.splitAssign(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (b, s) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("bucket") == b && r.getAs[String]("split") == s)
    }
  }

  test("scrub drops exactly the train docs with a cross-split candidate pair") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val t = graft.sources.Tables(sf)(spark)
    val asg = SplitQueries.splitAssign(spark, sf).select($"doc_id", $"split")
    val pairs = DedupQueries.lshPairsOf(t.documents)
      .join(asg.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "split_a"), Seq("doc_a"))
      .join(asg.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "split_b"), Seq("doc_b"))
      .collect()
    val leakTrain = pairs.flatMap { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      (if (sa == "train" && sb != "train") Seq(a) else Nil) ++
        (if (sb == "train" && sa != "train") Seq(b) else Nil)
    }.toSet
    val train = asg.where($"split" === "train").select("doc_id").as[Long].collect().toSet
    val survivors = SplitQueries.splitScrub(spark, sf).as[Long].collect().toSet
    assert(survivors == train -- leakTrain)
  }

  test("stratified sample takes exactly min(10, |stratum|) smallest-keyed docs per lang") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val byLang = graft.sources.Tables(sf)(spark).documents
      .select("doc_id", "lang").as[(Long, String)].collect().groupBy(_._2)
    val expected = byLang.flatMap { case (lang, rows) =>
      rows.map(_._1).sortBy(id => (md5hex("graft-strat-v1" + id), id)).take(10)
        .zipWithIndex.map { case (id, i) => (lang, i + 1, id) }.toSeq
    }.toSet
    val got = SplitQueries.queries("docs_stratified_topk").fn(spark, sf)
      .as[(String, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("drift audit cells recompute exactly from the assignment") {
    val asg = SplitQueries.splitAssign(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    val langs = graft.sources.Tables(sf)(spark).documents
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = asg.groupBy { case (id, split) => (split, langs(id)) }
      .map { case (k, v) => k -> v.size.toLong }
    val n = asg.length.toLong
    val byLang = asg.groupBy(p => langs(p._1)).map { case (k, v) => k -> v.size.toLong }
    val bySplit = asg.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val got = SplitQueries.splitDrift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == cells.keySet && got.nonEmpty)
    got.foreach { case ((split, lang), (o, em, chi2)) =>
      assert(o == cells((split, lang)))
      val (lt, st) = (byLang(lang), bySplit(split))
      assert(em == 1000L * lt * st / n, s"cell $split/$lang expectation")
      val dev = (o * n - lt * st).toDouble
      val expectChi = BigDecimal(dev * dev / (n.toDouble * lt * st))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(chi2 - expectChi) <= 1e-9, s"cell $split/$lang chi2")
      assert(chi2 >= 0)
    }
    // every split×lang cell present — the matrix is total
    assert(got.keySet.map(_._1) == bySplit.keySet)
  }

  test("leakage matrix totals equal the candidate pair count") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val t = graft.sources.Tables(sf)(spark)
    val nPairs = DedupQueries.lshPairsOf(t.documents).count()
    val matrix = SplitQueries.splitLeakage(spark, sf)
    assert(matrix.agg(sum($"n_pairs")).as[Long].head() === nPairs)
    // is_leak is exactly the train-crossing predicate
    matrix.collect().foreach { r =>
      val (sa, sb) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      val expected = sa != sb && (sa == "train" || sb == "train")
      assert(r.getAs[Boolean]("is_leak") === expected)
    }
  }
}
