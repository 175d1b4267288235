package graft.pipeline

import java.sql.Timestamp

import graft.TestSpark
import graft.streaming.{CdcStream, OrderChange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(base: String): Map[Long, (Long, Double)] =
    UpsertSink.snapshot(spark, base)
      .select("c_custkey", "o_orderkey", "new_bal")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("foreachBatch end-to-end: stream lands as an exactly-once keyed snapshot") {
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/dim"
    val d1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val d2 = Timestamp.valueOf("2026-02-01 00:00:00")
    val mem = MemoryStream[OrderChange](spark)
    val q = CdcStream.latestWins(mem.toDS())
      .toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        UpsertSink.applyBatch(spark, base)(b, id))
      .outputMode("update").start()
    try {
      mem.addData(
        OrderChange(1L, d1, 10L, "O", 5.0),
        OrderChange(2L, d1, 11L, "O", 7.0)); q.processAllAvailable()
      mem.addData(
        OrderChange(1L, d2, 20L, "O", 9.0), // supersedes key 1
        OrderChange(2L, d2, 21L, "F", 0.0), // deletes key 2
        OrderChange(3L, d1, 12L, "O", 4.0)); q.processAllAvailable()
    } finally q.stop()
    assert(snap(base) == Map(1L -> ((20L, 9.0)), 3L -> ((12L, 4.0))))
  }

  test("replayed batch is a no-op; snapshot survives crash-style redelivery") {
    val base = java.nio.file.Files.createTempDirectory("graft-upsert2").toString + "/dim"
    val d1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val b0 = Seq((7L, d1, 100L, "U", 1.5))
      .toDF("c_custkey", "o_orderdate", "o_orderkey", "op", "new_bal")
    UpsertSink.applyBatch(spark, base)(b0, 0L)
    val after0 = snap(base)
    assert(after0 == Map(7L -> ((100L, 1.5))))
    // foreachBatch redelivers batch 0 after a simulated crash → no-op,
    // even with different (stale) content
    val b0replay = Seq((7L, d1, 100L, "U", 999.0))
      .toDF("c_custkey", "o_orderdate", "o_orderkey", "op", "new_bal")
    UpsertSink.applyBatch(spark, base)(b0replay, 0L)
    assert(snap(base) == after0)
    assert(UpsertSink.appliedBatches(base) == Set(0L))
    // a genuinely new batch still applies
    val b1 = Seq((7L, Timestamp.valueOf("2026-03-01 00:00:00"), 101L, "U", 2.5))
      .toDF("c_custkey", "o_orderdate", "o_orderkey", "op", "new_bal")
    UpsertSink.applyBatch(spark, base)(b1, 1L)
    assert(snap(base) == Map(7L -> ((101L, 2.5))))
  }
}
