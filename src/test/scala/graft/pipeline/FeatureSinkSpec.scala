package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming feature-store landing: every register merges exactly, so
  * the feature view off streamed-in state must equal the batch
  * events_user_features column-for-column — and replaying an applied
  * batch is a no-op. */
class FeatureSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("user_id").collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.stripTrailingZeros
      case x => x
    }).toSeq

  test("streamed features equal the batch events_user_features; replay no-op") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-featsink").toString + "/feat"
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq.sortBy(_.ts.getTime)

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        FeatureSink.applyBatch(spark, base)(b, id))
      .outputMode("append").start()
    try {
      events.grouped((events.size / 4).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val served = rows(FeatureSink.features(FeatureSink.state(spark, base)))
    val batch = rows(graft.operators.EventAnalytics.userFeatures(spark, TestSpark.Sf0001))
    assert(served == batch && served.nonEmpty)

    // crash-style redelivery of an applied batch must not change state
    val before = rows(FeatureSink.state(spark, base))
    FeatureSink.applyBatch(spark, base)(
      graft.sources.Tables(TestSpark.Sf0001).events.limit(50), 0L)
    assert(rows(FeatureSink.state(spark, base)) == before)

    // and the landed registers equal a one-shot register build
    val oneShot = rows(FeatureSink.registers(
      graft.sources.Tables(TestSpark.Sf0001).events))
    assert(before == oneShot)
  }

  test("crash between publish and recordBatch: redelivery is still a no-op") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-featcrash").toString + "/feat"
    val events = graft.sources.Tables(TestSpark.Sf0001).events.limit(200)
    // batch 0 lands normally
    FeatureSink.applyBatch(spark, base)(events, 0L)
    // batch 1 CRASHES between the atomic publish and the manifest append:
    // simulate by doing exactly what applyBatch does, minus recordBatch
    val merged = FeatureSink.absorb(Snapshots.current(spark, base),
      graft.sources.Tables(TestSpark.Sf0001).events.limit(350))
    Snapshots.publish(base, 1L)(dir => merged.write.mode("overwrite").parquet(dir))
    val afterCrash = rows(FeatureSink.state(spark, base))
    // restart redelivers batch 1 — the live snapshot's own marker must
    // gate it out even though the manifest never recorded it
    FeatureSink.applyBatch(spark, base)(
      graft.sources.Tables(TestSpark.Sf0001).events.limit(350), 1L)
    assert(rows(FeatureSink.state(spark, base)) == afterCrash,
      "redelivered batch merged twice: counts doubled")
    // the NEXT batch heals the manifest and lands normally on top
    FeatureSink.applyBatch(spark, base)(
      graft.sources.Tables(TestSpark.Sf0001).events, 2L)
    assert(Snapshots.appliedBatches(base) == Set(0L, 1L, 2L))
  }
}
