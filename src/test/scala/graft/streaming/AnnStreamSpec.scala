package graft.streaming

import graft.TestSpark
import graft.operators.AnnQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN pinned to its batch twins: the same probes streamed
  * through a MemoryStream must emit row-identical top-k hits — exact
  * search vs `ann_bruteforce_topk`, index-backed serving vs
  * `ann_ivfpq_served`. The corpus side stays a static DataFrame in both
  * shapes (no driver-side corpus snapshot exists to test). */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def probeSeq = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.sources.Tables(TestSpark.Sf0001).embeddings
      .where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
      .as[Probe].collect().toSeq
  }

  test("streamed top-k matches batch ann_bruteforce_topk row-for-row") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val emb = graft.sources.Tables(TestSpark.Sf0001).embeddings

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.topK(mem.toDS(), emb, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann").outputMode("append").start()
    try {
      mem.addData(probeSeq)
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
    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding")).as[Probe]
    val got = AnnStream.topK(probes, emb, k = 5)
      .toDF().orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.bruteForceTopK(spark, TestSpark.Sf0001)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("streamed servedTopK matches batch ann_ivfpq_served row-for-row") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings
    // batch twin first — also trains/persists the index the stream serves from
    val want = AnnQueries.ivfPqServedTopK(spark, dir)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val idx = AnnQueries.ivfPqServedIndex(spark, dir)
    val cents = AnnQueries.readCentroids(spark, s"$idx/centroids")
    val cb = AnnQueries.readCodebook(spark, s"$idx/codebook")
    val codes = spark.read.parquet(s"$idx/codes")

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.servedTopK(mem.toDS(), emb, codes, cents, cb, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann_served").outputMode("append").start()
    try {
      mem.addData(probeSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("s_ann_served")
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("servedTopK runs the same code path in batch mode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings
    val idx = AnnQueries.ivfPqServedIndex(spark, dir)
    val cents = AnnQueries.readCentroids(spark, s"$idx/centroids")
    val cb = AnnQueries.readCodebook(spark, s"$idx/codebook")
    val codes = spark.read.parquet(s"$idx/codes")
    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding")).as[Probe]
    val got = AnnStream.servedTopK(probes, emb, codes, cents, cb, k = 5)
      .toDF().orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.ivfPqServedTopK(spark, dir)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("streamed hybrid fusion matches the batch text_hybrid_rrf for the same probe") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings
    val lex = graft.operators.TextIndexQueries.bm25Ranked(spark, dir)
    val probe0 = emb.where(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding")).as[Probe].collect().toSeq

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.hybridTopK(mem.toDS(), emb, lex)
      .toDF().writeStream.format("memory").queryName("s_hybrid").outputMode("append").start()
    try {
      mem.addData(probe0)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("s_hybrid").where(col("probe_id") === 0L)
      .select("doc_id", "rank_lex", "rank_vec", "rrf")
      .orderBy(col("rrf").desc, col("doc_id"))
      .as[(Long, Int, Int, Long)].collect().toSeq
    val want = graft.operators.TextIndexQueries.hybridRrf(spark, dir)
      .orderBy(col("rrf").desc, col("doc_id"))
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(got == want && got.size == 20)
  }

  test("streamed twoLevelTopK matches batch ann_ivf_topk_twolevel row-for-row, chunked arrivals") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings
    val cents = AnnQueries.seedCentroids(spark, dir)

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.twoLevelTopK(mem.toDS(), emb, cents, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann_twolevel").outputMode("append").start()
    try {
      probeSeq.grouped(4).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("s_ann_twolevel")
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.queries("ann_ivf_topk_twolevel").fn(spark, dir)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("streamed matryoshkaTopK matches batch ann_matryoshka_refine row-for-row, chunked arrivals") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.matryoshkaTopK(mem.toDS(), emb, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann_mrl").outputMode("append").start()
    try {
      probeSeq.grouped(4).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("s_ann_mrl")
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.queries("ann_matryoshka_refine").fn(spark, dir)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("streamed crossModalTopK matches batch mm_ann_crossmodal row-for-row") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = TestSpark.Sf0001
    val emb = graft.sources.Tables(dir).embeddings
    val cents = AnnQueries.seedCentroids(spark, dir)
    // the family probe set restricted to text modality (the batch rule)
    val textProbes = probeSeq.filter(p => p.probe_id % 4 != 1 && p.probe_id % 4 != 2)

    val mem = MemoryStream[Probe](spark)
    val q = AnnStream.crossModalTopK(mem.toDS(), emb, cents, k = 5)
      .toDF().writeStream.format("memory").queryName("s_ann_xmodal").outputMode("append").start()
    try {
      mem.addData(textProbes)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("s_ann_xmodal")
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = AnnQueries.queries("mm_ann_crossmodal").fn(spark, dir)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }
}
