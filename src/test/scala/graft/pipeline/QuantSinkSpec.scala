package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quantile landing: because QuantHist merge is EXACT, the
  * landed state after streaming in micro-batches must be bit-identical
  * to a one-shot batch build over the same rows — and replaying an
  * applied batch is a no-op. */
class QuantSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed summary is bit-identical to the one-shot build; replay is a no-op") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-quantsink").toString + "/quant"
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq.sortBy(_.ts.getTime)
    val cents = floor(col("value") * 100).cast("long")

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        QuantSink.applyBatch(spark, base, cents, col("event_type"))(b, id))
      .outputMode("append").start()
    try {
      events.grouped((events.size / 3).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val landed = QuantSink.summary(spark, base)
      .orderBy("grain", "bin").collect().map(_.toSeq).toSeq
    val oneShot = QuantHist.build(
        graft.sources.Tables(TestSpark.Sf0001)(spark).events, cents, col("event_type"))
      .orderBy("grain", "bin").collect().map(_.toSeq).toSeq
    assert(landed == oneShot && landed.nonEmpty)

    // quantile reads come straight off the landed state and carry the
    // covering-bin contract vs the exact per-type quantiles
    val exact = graft.sources.Tables(TestSpark.Sf0001)(spark).events
      .select(col("event_type"), cents.as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    QuantSink.quantiles(spark, base, Seq(500, 990)).collect().foreach { r =>
      val xs = exact(r.getAs[String]("grain"))
      val rank = (xs.size * r.getAs[Int]("q_pm") + 999) / 1000
      val truth = xs(rank - 1)
      assert(r.getAs[Long]("lo") <= truth && truth <= r.getAs[Long]("hi"))
    }

    // replay gate
    val before = QuantSink.summary(spark, base).collect().map(_.toSeq).toSet
    QuantSink.applyBatch(spark, base, cents, col("event_type"))(
      graft.sources.Tables(TestSpark.Sf0001)(spark).events, 0L)
    val after = QuantSink.summary(spark, base).collect().map(_.toSeq).toSet
    assert(after == before)
  }
}
