package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL landing: exact register merge makes the landed state
  * bit-identical to the one-shot build; replay is a no-op; the estimate
  * reads match the batch query's. */
class HllSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed registers are bit-identical to the one-shot build; replay no-op") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-hllsink").toString + "/hll"
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq.sortBy(_.ts.getTime)

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        HllSink.applyBatch(spark, base, col("user_id"), col("event_type"))(b, id))
      .outputMode("append").start()
    try {
      events.grouped((events.size / 3).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val landed = HllSink.summary(spark, base)
      .orderBy("grain", "reg").collect().map(_.toSeq).toSeq
    val oneShot = HllTable.build(
        graft.sources.Tables(TestSpark.Sf0001)(spark).events,
        col("user_id"), col("event_type"))
      .orderBy("grain", "reg").collect().map(_.toSeq).toSeq
    assert(landed == oneShot && landed.nonEmpty)

    val before = HllSink.summary(spark, base).collect().map(_.toSeq).toSet
    HllSink.applyBatch(spark, base, col("user_id"), col("event_type"))(
      graft.sources.Tables(TestSpark.Sf0001)(spark).events, 0L)
    assert(HllSink.summary(spark, base).collect().map(_.toSeq).toSet == before)
  }
}
