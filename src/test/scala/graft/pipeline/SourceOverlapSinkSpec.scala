package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14: streaming landing for the source-overlap governance state.
  * Documents streamed in micro-batches must land catalog/pairs/sizes/dict
  * registers whose report equals the batch `dedup_source_overlap` matrix,
  * regardless of how the corpus is split into batches, and replay of an
  * applied batchId must be a no-op. */
class SourceOverlapSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Row6 = (String, String, Long, Long, Long, Long)

  private def matrixOf(df: org.apache.spark.sql.DataFrame): Seq[Row6] =
    df.select("src_a", "src_b", "n_common", "n_a", "n_b", "jaccard_pm")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def landVia(chunks: Int): String = {
    val base = java.nio.file.Files.createTempDirectory("graft-srcovl").toString + "/ovl"
    val docs = graft.sources.Tables(TestSpark.Sf0001)(spark).documents
      .select(col("doc_id"), col("source"), col("text"))
    val rows = docs.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        SourceOverlapSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      rows.grouped((rows.size / chunks).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    graft.operators.Cached.releaseAll()
    base
  }

  test("streamed overlap state reports the batch matrix; split-invariant; replay idempotent") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val want = matrixOf(
      graft.operators.DedupQueries.queries("dedup_source_overlap")
        .fn(spark, TestSpark.Sf0001))
    graft.operators.Cached.releaseAll()

    // three micro-batches == one batch == the batch query
    val base3 = landVia(3)
    val got3 = matrixOf(SourceOverlapSink.report(spark, base3))
    assert(got3 == want && got3.nonEmpty)
    val base1 = landVia(1)
    assert(matrixOf(SourceOverlapSink.report(spark, base1)) == want)

    // redelivered batchId: a no-op on the landed registers
    val docs = graft.sources.Tables(TestSpark.Sf0001)(spark).documents
      .select(col("doc_id"), col("source"), col("text")).limit(50)
    SourceOverlapSink.applyBatch(spark, base3)(docs, 0L)
    assert(matrixOf(SourceOverlapSink.report(spark, base3)) == want)
    graft.operators.Cached.releaseAll()
  }
}
