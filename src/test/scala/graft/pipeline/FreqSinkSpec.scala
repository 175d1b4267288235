package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MG landing: batches streamed in arrival order must keep the
  * summary contract (never overcount, undershoot ≤ err, heavy hitters
  * present) against the EXACT one-shot counts, with grains split across
  * micro-batches; replaying an applied batch is a no-op. */
class FreqSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8

  test("streamed summary keeps the MG bound and survives replay") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-freqsink").toString + "/freq"
    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Event].collect().toSeq.sortBy(_.ts.getTime)

    val mem = MemoryStream[graft.streaming.Event](spark)
    val q = mem.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        FreqSink.applyBatch(spark, base, col("user_id"), to_date(col("ts")), K)(b, id))
      .outputMode("append").start()
    try {
      // three arrival-ordered chunks: day boundaries land MID-chunk, so
      // grains are split across micro-batches
      events.grouped((events.size / 3).max(1)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val exact = graft.sources.Tables(TestSpark.Sf0001)(spark).events
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = FreqSink.merged(spark, base, K).collect()
    val err = m.head.getLong(2)
    val est = m.map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (u, e) =>
      assert(e <= exact(u) && e >= exact(u) - err, s"user $u out of bound")
    }
    (exact.keySet -- est.keySet).foreach(u => assert(exact(u) <= err))
    exact.filter(_._2 > err).keys.foreach(u => assert(est.contains(u)))

    // replaying an already-applied batch must not change the landed state
    val before = FreqSink.summary(spark, base).collect().map(_.toSeq).toSet
    val replay = graft.sources.Tables(TestSpark.Sf0001)(spark).events
    FreqSink.applyBatch(spark, base, col("user_id"), to_date(col("ts")), K)(replay, 0L)
    val after = FreqSink.summary(spark, base).collect().map(_.toSeq).toSet
    assert(after == before)
  }
}
