package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Whale-cluster cap contract for semantic dedup: the capped variant is
  * exactly the uncapped result restricted to non-whale clusters (a
  * documented undercount, never a different answer), and tightening the
  * factor only ever shrinks the output — the BandedPairsPlan `maxBucket`
  * monotonicity transposed to embedding space. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long, Double)] = {
    import spark.implicits._
    df.select("cluster", "vec_id", "dup_of", "max_cos")
      .as[(Int, Long, Long, Double)].collect().toSet
  }

  test("a permissive factor reproduces the uncapped result exactly") {
    val uncapped = rows(AnnQueries.semanticDedup(spark, dir))
    val capped = rows(AnnQueries.semanticDedupCapped(spark, dir, whaleFactor = 1e9))
    assert(capped == uncapped && uncapped.nonEmpty)
  }

  test("capped == uncapped restricted to kept clusters (undercount contract)") {
    val factor = 0.9 // tight enough to drop at least one cluster at sf0.001
    val uncapped = AnnQueries.semanticDedup(spark, dir)
    // independent occupancy reading: count every embedding's cluster via
    // the same query's own cluster column is not available here, so rely
    // on the capped variant's kept set being a cluster-complete subset:
    val capped = rows(AnnQueries.semanticDedupCapped(spark, dir, factor))
    val un = rows(uncapped)
    assert(capped.subsetOf(un))
    val droppedClusters = un.map(_._1) -- capped.map(_._1)
    // every kept cluster keeps ALL its pairs; every dropped cluster loses all
    val keptClusters = capped.map(_._1)
    assert(un.filter(r => keptClusters.contains(r._1)) == capped)
    assert(droppedClusters.nonEmpty, "factor 0.9 should drop at least one cluster at sf0.001")
  }

  test("tightening the factor is monotone (smaller cap => subset)") {
    val fs = Seq(0.5, 0.9, 1.5, 4.0)
    val results = fs.map(f => rows(AnnQueries.semanticDedupCapped(spark, dir, f)))
    results.sliding(2).foreach { case Seq(tight, loose) =>
      assert(tight.subsetOf(loose))
    }
  }
}
