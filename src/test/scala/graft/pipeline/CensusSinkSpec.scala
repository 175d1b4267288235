package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming window-hash census: documents streamed in micro-batches must
  * fold to the SAME census as one batch pass (mergeable integer
  * register), replay of an applied batch is a no-op, and scoring the
  * corpus against the fully-landed census reproduces the registered
  * `dedup_substring_coverage` result bit-for-bit. */
class CensusSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String)

  test("streamed census = batch census; coverage replay pins the registered query") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-census").toString + "/census"
    val docs = graft.sources.Tables(TestSpark.Sf0001).documents
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        CensusSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      rows.grouped((rows.size / 4).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    // the landed register equals the one-shot census (mergeable counts)
    val landed = CensusSink.census(spark, base)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = graft.operators.SubstringDedup.censusOf(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(landed == oneShot, "streamed census diverged from the batch census")

    // scoring against the fully-landed census = the registered query, bit-for-bit
    val streamed = CensusSink.coverage(spark, base, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.operators.SubstringDedup.queries("dedup_substring_coverage")
      .fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, "census-scored coverage diverged from dedup_substring_coverage")

    // replaying an already-applied batch must not change the landed state
    CensusSink.applyBatch(spark, base)(docs, 0L)
    val after = CensusSink.census(spark, base)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == landed)
  }

  test("mid-stream coverage is a monotone lower bound per document") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-census2").toString + "/census"
    val docs = graft.sources.Tables(TestSpark.Sf0001).documents
      .select(col("doc_id"), col("text"))
    val half = docs.where(col("doc_id") % 2 === 0)
    CensusSink.applyBatch(spark, base)(half, 0L)
    val early = CensusSink.coverage(spark, base, half)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    CensusSink.applyBatch(spark, base)(docs.where(col("doc_id") % 2 === 1), 1L)
    val late = CensusSink.coverage(spark, base, half)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(early.keySet == late.keySet)
    early.foreach { case (d, pm) =>
      assert(pm <= late(d), s"doc $d dup_permille shrank as corpus landed")
    }
  }
}
