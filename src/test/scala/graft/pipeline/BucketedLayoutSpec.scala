package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed layout answers the recurring join with ZERO exchanges") {
    val path = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    BucketedLayout.write(spark, TestSpark.Sf0001, path, buckets = 4)
    // broadcast off = the honest 100 TB configuration (neither side fits)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedLayout.colocatedOrdersPerCustomer(spark)
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // and the layout changes nothing about the answer
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val t = graft.sources.Tables(TestSpark.Sf0001)
      val want = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("o_orderkey"), col("o_totalprice"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == want && want.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
