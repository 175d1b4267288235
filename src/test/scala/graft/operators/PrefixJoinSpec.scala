package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filter exactness: the pruned join must equal the naive all-pairs
  * answer — completeness (no qualifying pair lost to pruning) and
  * soundness (every emitted pair passes the τ test) in one compare. */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def naive(): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val docs = graft.sources.Tables(sf)(spark).documents
    val hsd = docs
      .withColumn("ww", graft.functions.TextFunctions.words($"text"))
      .withColumn("w", array_distinct(graft.functions.TextFunctions.shingles("ww")))
      .select($"doc_id", explode(array_distinct(
        transform($"w", x => graft.plans.VectorExpressions.hexPrefix(md5(x), 15)))).as("hv"))
    val sz = hsd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ip = hsd.as("a").join(hsd.as("b"),
        $"a.hv" === $"b.hv" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    ip.join(sz.select($"doc_id".as("doc_a"), $"n".as("n_a")), Seq("doc_a"))
      .join(sz.select($"doc_id".as("doc_b"), $"n".as("n_b")), Seq("doc_b"))
      .where($"n_inter" * 3 >= ($"n_a" + $"n_b"))
      .select($"doc_a", $"doc_b", $"n_inter", ($"n_a" + $"n_b" - $"n_inter").as("n_union"))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("prefix-filtered join equals the naive all-pairs answer at sf0.001") {
    import spark.implicits._
    val pruned = PrefixJoin.allPairsJaccard(spark, sf)
      .select($"doc_a", $"doc_b", $"n_inter", $"n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = naive()
    assert(exact.nonEmpty, "corpus should contain near-dup pairs at tau=1/2")
    assert(pruned == exact)
  }

  test("every emitted pair satisfies the integer tau test") {
    val rows = PrefixJoin.allPairsJaccard(spark, sf).collect()
    rows.foreach { r =>
      val (i, u) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))
      assert(2 * i >= u, s"pair ${r} below tau")
    }
  }
}
