package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GapfillSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("live gap-fill landing: streamed batches render the one-shot series exactly") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-gfsink").toString + "/daily"
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        GapfillSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      val (h1, h2) = events.splitAt(events.size / 2)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
    } finally q.stop()

    val got = GapfillSink.render(spark, base).collect().map(_.toSeq).toSet
    val want = graft.operators.ChangeData.gapfill(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSet
    assert(got == want && want.nonEmpty)
    assert(Snapshots.appliedBatches(base).size >= 2)
  }
}
