package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("association rules recompute exactly from a driver basket count") {
    val op = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = op.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val pairCount = baskets.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val itemCount = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = baskets.size.toLong
    val expect = pairCount.flatMap { case ((a, b), np) =>
      Seq((a, b, np), (b, a, np)).map { case (l, r, n) =>
        (l, r) -> (n, n * 1000 / itemCount(l),
          n * nOrders * 1000000 / (itemCount(l) * itemCount(r)))
      }
    }
    val got = JoinQueries.assocRules(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect && got.nonEmpty)
    // lift is symmetric, confidence need not be — both rules exist
    got.keys.foreach { case (l, r) => assert(got.contains((r, l))) }
  }

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
