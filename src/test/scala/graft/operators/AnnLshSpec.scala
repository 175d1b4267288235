package graft.operators

import graft.TestSpark
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Threshold = 0.35

  private lazy val lshPairs: Set[(Long, Long)] =
    AnnQueries.queries("ann_lsh_cosine").fn(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Exact thresholded pair set (all-pairs, feasible at 500 vectors). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(round(VectorExpressions.dot(col("e_a"), col("e_b"))
        / (sqrt(VectorExpressions.dot(col("e_a"), col("e_a")))
          * sqrt(VectorExpressions.dot(col("e_b"), col("e_b")))), 6) >= Threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("no false positives: every emitted pair is exactly above threshold") {
    assert(lshPairs.subsetOf(exactPairs))
  }

  test("recall floor at the documented operating point (B=12, R=5, τ=0.35)") {
    val recall = lshPairs.size.toDouble / exactPairs.size
    assert(exactPairs.nonEmpty)
    assert(recall >= 0.6, s"recall $recall (${lshPairs.size}/${exactPairs.size})")
  }

  private lazy val multiprobePairs: Set[(Long, Long)] =
    AnnQueries.queries("ann_lsh_multiprobe").fn(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multiprobe at tight geometry: superset of plain, ~4x recall, still exact") {
    val plainTight = AnnQueries.lshSearch(spark, dir, 8, 8, multiprobe = false)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plainTight.subsetOf(multiprobePairs)) // probe set includes the original bucket
    assert(multiprobePairs.subsetOf(exactPairs)) // rerank keeps it exact
    val plainRecall = plainTight.size.toDouble / exactPairs.size
    val mpRecall = multiprobePairs.size.toDouble / exactPairs.size
    assert(plainRecall < 0.2, s"plain(8,8) recall $plainRecall")
    assert(mpRecall >= 0.4, s"multiprobe recall $mpRecall")
    assert(mpRecall >= 3 * plainRecall, s"lift ${mpRecall / plainRecall}")
  }

  test("ann_lsh_recall: anchor-restricted audit matches driver recompute from the full pair sets") {
    // the registered audit restricts BOTH sides to pairs touching a
    // 40-anchor hash-rank draw; its counts must equal the full exact and
    // full LSH pair sets filtered to anchor-involving pairs — the claim
    // that the restriction changes cost (budget x corpus), not semantics
    val allIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val anchors = allIds.map(id => (md5hex("graft-lsh-audit:" + id), id))
      .sorted.take(40).map(_._2).toSet
    val exA = exactPairs.filter(p => anchors(p._1) || anchors(p._2))
    val lshA = lshPairs.filter(p => anchors(p._1) || anchors(p._2))
    val ov = exA.intersect(lshA)
    val row = AnnQueries.queries("ann_lsh_recall").fn(spark, dir).collect().head
    assert(row.getLong(row.fieldIndex("n_exact")) == exA.size)
    assert(row.getLong(row.fieldIndex("n_lsh")) == lshA.size)
    assert(row.getLong(row.fieldIndex("n_overlap")) == ov.size)
    assert(row.getLong(row.fieldIndex("recall_pm")) ==
      ov.size.toLong * 1000 / math.max(exA.size, 1))
  }

  test("banded self-join plans as an equi-join, never a cartesian product") {
    val plan = AnnQueries.queries("ann_lsh_cosine").fn(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
