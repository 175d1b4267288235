package graft.streaming

import graft.TestSpark
import graft.operators.AnnQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN pinned to the batch brute-force result: the same probes
  * streamed through a MemoryStream against a corpus snapshot must emit
  * row-identical top-k hits. */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed top-k matches batch ann_bruteforce_topk row-for-row") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val emb = graft.sources.Tables(TestSpark.Sf0001).embeddings
    val corpus = AnnStream.corpusSnapshot(emb)
    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
      .as[Probe].collect().toSeq

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.topK(mem.toDS(), corpus, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann").outputMode("append").start()
    try {
      mem.addData(probes)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("s_ann")
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.bruteForceTopK(spark, TestSpark.Sf0001)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("topK runs the same code path in batch mode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val emb = graft.sources.Tables(TestSpark.Sf0001).embeddings
    val corpus = AnnStream.corpusSnapshot(emb)
    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding")).as[Probe]
    val got = AnnStream.topK(probes, corpus, k = 5)
      .toDF().orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.bruteForceTopK(spark, TestSpark.Sf0001)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }
}
