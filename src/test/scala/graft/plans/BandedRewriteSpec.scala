package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-reachability rewrite: a standard bucket self-join written in
  * plain SQL must plan as BandedPairsExec, produce identical results to
  * the un-rewritten join, and never fire where semantics could differ. */
class BandedRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    BandedPairsRewrite.install(s)
    s
  }

  private def withBands[T](f: => T): T = {
    import spark.implicits._
    Seq(
      (0L, 0, "h1"), (1L, 0, "h1"), (2L, 0, "h1"),
      (3L, 0, "h2"), (4L, 0, "h2"),
      (0L, 1, "x1"), (1L, 1, "x1"), // duplicate pair via second band
      (5L, 1, "x2"))
      .toDF("doc_id", "band_id", "band_hash")
      .createOrReplaceTempView("bands_v")
    // duplicate (bucket, id) rows — the multiplicity trap
    Seq((0L, "o1"), (0L, "o1"), (1L, "o1"), (2L, "o2"))
      .toDF("item", "ord")
      .createOrReplaceTempView("dup_rows_v")
    try f finally {
      spark.catalog.dropTempView("bands_v"); spark.catalog.dropTempView("dup_rows_v")
    }
  }

  private val distinctPairsSql =
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bands_v a JOIN bands_v b
      |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
      | AND a.doc_id < b.doc_id""".stripMargin

  private def withRewrite[T](on: Boolean)(f: => T): T = {
    val old = spark.conf.getOption(BandedPairsRewrite.ConfKey)
    spark.conf.set(BandedPairsRewrite.ConfKey, on.toString)
    try f finally old match {
      case Some(v) => spark.conf.set(BandedPairsRewrite.ConfKey, v)
      case None => spark.conf.unset(BandedPairsRewrite.ConfKey)
    }
  }

  test("DISTINCT self-join plans as BandedPairsExec with identical results") {
    withBands {
      val rewritten = withRewrite(on = true)(spark.sql(distinctPairsSql))
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("BandedPairs"))
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = withRewrite(on = false) {
        val df = spark.sql(distinctPairsSql)
        assert(!df.queryExecution.optimizedPlan.toString.contains("BandedPairs"))
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(got == want)
      assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
    }
  }

  test("non-distinct projection fires only over a duplicate-free input") {
    withBands {
      // distinct subquery input (the co-purchase shape): rewrite fires
      val dedupInput =
        """SELECT a.item AS item_a, b.item AS item_b
          |FROM (SELECT DISTINCT item, ord FROM dup_rows_v) a
          |JOIN (SELECT DISTINCT item, ord FROM dup_rows_v) b
          |  ON a.ord = b.ord AND a.item < b.item""".stripMargin
      val df = spark.sql(dedupInput)
      assert(df.queryExecution.optimizedPlan.toString.contains("BandedPairs"))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))

      // raw input with duplicate rows and no dedup anywhere: the join
      // multiplies the (o1: 0,1) pair — rewrite must NOT fire
      val rawDup =
        """SELECT a.item AS item_a, b.item AS item_b
          |FROM dup_rows_v a JOIN dup_rows_v b
          |  ON a.ord = b.ord AND a.item < b.item""".stripMargin
      val raw = spark.sql(rawDup)
      assert(!raw.queryExecution.optimizedPlan.toString.contains("BandedPairs"))
      assert(raw.count() == 2) // duplicated pair preserved
    }
  }

  test("does not fire: different tables, residual predicates, non-long id") {
    withBands {
      // residual conjunct beyond keys + strict id inequality
      val residual =
        """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM bands_v a JOIN bands_v b
          |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
          | AND a.doc_id < b.doc_id AND a.doc_id + b.doc_id > 1""".stripMargin
      assert(!spark.sql(residual).queryExecution.optimizedPlan.toString
        .contains("BandedPairs"))
      // differing subqueries on the two sides
      val asym =
        """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM bands_v a JOIN (SELECT * FROM bands_v WHERE band_id = 0) b
          |  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
          | AND a.doc_id < b.doc_id""".stripMargin
      assert(!spark.sql(asym).queryExecution.optimizedPlan.toString
        .contains("BandedPairs"))
    }
  }

  test("rewritten plan agrees with the Scala API operator") {
    withBands {
      val viaSql = withRewrite(on = true)(spark.sql(distinctPairsSql))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaApi = graft.operators.Banded
        .pairsExec(spark.table("bands_v"), Seq("band_id", "band_hash"), "doc_id")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaSql == viaApi)
    }
  }
}
