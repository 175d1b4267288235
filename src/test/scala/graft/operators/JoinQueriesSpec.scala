package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("burstPairs banded join matches the naive range self-join") {
    val got = JoinQueries.burstPairs(spark, TestSpark.Sf0001)
      .orderBy("user_id", "event_a", "event_b")
      .as[(Long, Long, Long, Long)].collect().toSeq

    implicit val s: org.apache.spark.sql.SparkSession = spark
    val e = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val a = e.toDF("user_id", "event_a", "us_a")
    val b = e.toDF("user_id", "event_b", "us_b")
    val want = a.join(b, "user_id") // naive quadratic-per-user formulation
      .where(col("us_b") - col("us_a") >= 0 && col("us_b") - col("us_a") <= 600000000L &&
        (col("us_a") < col("us_b") ||
          (col("us_a") === col("us_b") && col("event_a") < col("event_b"))))
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
      .orderBy("user_id", "event_a", "event_b")
      .as[(Long, Long, Long, Long)].collect().toSeq

    assert(got == want && got.nonEmpty)
  }

  test("burstPairs emits each qualifying pair exactly once (no distinct in the plan)") {
    val df = JoinQueries.burstPairs(spark, TestSpark.Sf0001)
    val pairs = df.select("event_a", "event_b").as[(Long, Long)].collect().toSeq
    assert(pairs.distinct.size == pairs.size)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Distinct"), plan)
  }
}
