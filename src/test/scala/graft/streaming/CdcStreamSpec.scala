package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ordersAsChanges = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.sources.Tables(TestSpark.Sf0001).orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .as[OrderChange]
  }

  test("batch latestWins equals the batch CDC window's per-key latest") {
    val got = CdcStream.latestWins(ordersAsChanges)
      .collect().map(c => c.c_custkey -> ((c.op, c.new_bal))).toMap
    val want = ordersAsChanges.toDF()
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .where(col("rn") === 1)
      .select(col("o_custkey"),
        when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"),
        col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("streaming: supersede re-emits, stale replay is swallowed") {
    val d1 = Timestamp.valueOf("2026-01-01 00:00:00")
    val d2 = Timestamp.valueOf("2026-02-01 00:00:00")
    val mem = MemoryStream[OrderChange](spark)
    val q = CdcStream.latestWins(mem.toDS())
      .toDF().writeStream.format("memory").queryName("cdc_up").outputMode("update").start()
    try {
      mem.addData(OrderChange(7L, d1, 100L, "O", 10.0)); q.processAllAvailable()
      // newer order supersedes → re-emit with the new payload
      mem.addData(OrderChange(7L, d2, 200L, "F", 20.0)); q.processAllAvailable()
      // stale replay of the first change → swallowed, no emission
      mem.addData(OrderChange(7L, d1, 100L, "O", 10.0)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cdc_up")
      .select("c_custkey", "o_orderkey", "op", "new_bal")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(got == Seq((7L, 100L, "U", 10.0), (7L, 200L, "D", 20.0)))
  }
}
