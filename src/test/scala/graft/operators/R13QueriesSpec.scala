package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver recomputes / consistency pins for the r13 queries (each is also
  * DuckDB-oracled at both gate SFs; these catch same-engine regressions
  * without the oracle in the loop). The incremental source-overlap fold
  * is pinned separately in StagedFramesSpec (associativity + batch
  * equality). */
class R13QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("dedup_cluster_sizes: rollup of the cluster table, mass-conserving") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val clusters = DedupQueries.nearDupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = clusters.groupBy(_._2).values.toSeq
      .map(ms => (ms.size.toLong, ms.map(m => chars(m._1)).sum))
      .groupBy(_._1).map { case (sz, cs) =>
        (sz, cs.size.toLong, sz * cs.size, cs.map(_._2).sum)
      }.toSeq.sortBy(_._1)
    val got = DedupQueries.clusterSizes(spark, sf)
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want && got.nonEmpty)
    // conservation: every doc and every char lands in exactly one bucket
    assert(got.map(_._3).sum == clusters.size)
    assert(got.map(_._4).sum == clusters.map(c => chars(c._1)).sum)
  }

  test("text_token_diversity: driver recompute of TTR and Gini on sf0.001") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val want = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val n = toks.length.toLong
      if (n == 0) (id, 0L, 0L, 0L, 0L)
      else {
        val cnts = toks.groupBy(identity).map(_._2.length.toLong)
        val ss = cnts.map(c => BigInt(c) * c).sum
        (id, n, cnts.size.toLong, cnts.size * 1000L / n,
          (BigInt(1000) - ss * 1000 / (BigInt(n) * n)).toLong)
      }
    }.sortBy(_._1)
    val got = TextQueries.tokenDiversity(spark, sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // a doc repeating one token scores 0 diversity; all-distinct scores
    // 1000·(1 − 1/n), which the integer div rounds to exactly 1000 once
    // n > 1000 (ss·1000 < n²) — so the bound is inclusive
    assert(got.forall(t => t._5 >= 0 && t._5 <= 1000))
  }
}
