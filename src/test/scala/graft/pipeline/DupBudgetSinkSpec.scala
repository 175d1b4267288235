package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r11: per-source duplication-budget alarm sink. Documents streamed in
  * micro-batches must land a counter state whose report equals the batch
  * `dedup_source_report`'s (n_docs, n_dup_docs) columns (retrospective
  * dup semantics maintained incrementally), replay of an applied batch
  * is a no-op, and the alarm flag follows the budget. */
class DupBudgetSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed dup-budget state reports the batch source-report counts; replay idempotent") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-dupbudget").toString + "/dup"
    val docs = graft.sources.Tables(TestSpark.Sf0001).documents
      .select(col("doc_id"), col("source"), col("text"))
    val rows = docs.as[(Long, String, String)].collect().toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, String, String)](spark)
    val q = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        DupBudgetSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      rows.grouped((rows.size / 3).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val got = DupBudgetSink.report(spark, base, budgetPm = 100L)
      .select("source", "n_docs", "n_dup_docs", "dup_pm", "alarm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    val want = graft.operators.DedupQueries.queries("dedup_source_report")
      .fn(spark, TestSpark.Sf0001)
      .select("source", "n_docs", "n_dup_docs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want.toSeq && got.nonEmpty)
    // alarm follows the budget arithmetic exactly
    got.foreach { case (_, nd, ndup, pm, alarm) =>
      assert(pm == ndup * 1000 / math.max(nd, 1))
      assert(alarm == (pm > 100L))
    }

    // replaying an applied batch is a no-op (idempotence manifest)
    val before = DupBudgetSink.report(spark, base, 100L)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    DupBudgetSink.applyBatch(spark, base)(
      docs.limit(50), 0L) // batchId 0 already applied
    val after = DupBudgetSink.report(spark, base, 100L)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(before == after)
  }
}
