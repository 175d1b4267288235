package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming experiment monitor: the per-hour arm-count registers are
  * purely additive, so the mSPRT and SRM views off streamed-in state
  * must equal the batch events_msprt / events_srm_check
  * column-for-column; batch boundaries must not matter; and replaying
  * an applied batch is a no-op.
  */
class MonitorSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame, key: String): Seq[Seq[Any]] =
    df.orderBy(key).collect().map(_.toSeq).toSeq

  test("streamed monitor equals batch msprt + srm; order and replay invariance") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-monsink").toString + "/mon"
    // adversarial arrival order: REVERSE time, so late data lands first
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq.sortBy(-_.ts.getTime)

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        MonitorSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      events.grouped((events.size / 5).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val st = MonitorSink.state(spark, base)
    val gotMsprt = rows(MonitorSink.msprt(st), "h")
    val batchMsprt = rows(
      graft.operators.EventAnalytics.queries("events_msprt").fn(spark, TestSpark.Sf0001), "h")
    assert(gotMsprt == batchMsprt && gotMsprt.nonEmpty)

    val gotSrm = rows(MonitorSink.srm(st), "day")
    val batchSrm = rows(
      graft.operators.EventAnalytics.queries("events_srm_check").fn(spark, TestSpark.Sf0001), "day")
    assert(gotSrm == batchSrm && gotSrm.nonEmpty)

    // redelivery of an applied batchId must not change state
    val before = rows(st, "h")
    MonitorSink.applyBatch(spark, base)(
      graft.sources.Tables(TestSpark.Sf0001).events.limit(100), 0L)
    assert(rows(MonitorSink.state(spark, base), "h") == before)

    // landed registers equal a one-shot register build (merge exactness)
    val oneShot = rows(MonitorSink.registers(
      graft.sources.Tables(TestSpark.Sf0001).events), "h")
    assert(before == oneShot)
  }

  test("a different batch split lands bit-identical state") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ev = graft.sources.Tables(TestSpark.Sf0001).events
    val baseA = java.nio.file.Files.createTempDirectory("graft-mona").toString + "/mon"
    val baseB = java.nio.file.Files.createTempDirectory("graft-monb").toString + "/mon"
    MonitorSink.applyBatch(spark, baseA)(ev, 0L)
    val n = ev.count()
    MonitorSink.applyBatch(spark, baseB)(ev.orderBy("event_id").limit((n / 3).toInt), 0L)
    MonitorSink.applyBatch(spark, baseB)(
      ev.orderBy("event_id").offset((n / 3).toInt), 1L)
    assert(rows(MonitorSink.state(spark, baseA), "h")
      == rows(MonitorSink.state(spark, baseB), "h"))
  }
}
