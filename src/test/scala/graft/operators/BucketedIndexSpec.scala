package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

class BucketedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed dedup index: archive side never shuffles, results unchanged") {
    val path = java.nio.file.Files.createTempDirectory("graft-dedupidx").toString
    DedupQueries.persistDedupIndexBucketed(spark, TestSpark.Sf0001, path, buckets = 4)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = DedupQueries.incrementalDedupFromCatalog(spark, TestSpark.Sf0001)
      // no Exchange may sit ABOVE a scan of either bucketed index table —
      // the archive reads straight from its buckets
      val plan = df.queryExecution.executedPlan
      val offending = plan.collect { case e: Exchange => e }.filter(e =>
        e.exists { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("graft-dedupidx"))
        case _ => false })
      assert(offending.isEmpty, s"index side shuffles:\n$plan")
      // and the bucketed layout changes nothing about the verdicts
      val want = DedupQueries.queries("dedup_incremental")
        .fn(spark, TestSpark.Sf0001).collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == want && want.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bucketed containment index: archive side never shuffles, results match the registered query") {
    val path = java.nio.file.Files.createTempDirectory("graft-contidx").toString
    DedupQueries.persistContainmentIndexBucketed(spark, TestSpark.Sf0001, path, buckets = 4)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = DedupQueries.containmentFromCatalog(spark, TestSpark.Sf0001)
      val plan = df.queryExecution.executedPlan
      val offending = plan.collect { case e: Exchange => e }.filter(e =>
        e.exists { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("graft-contidx"))
        case _ => false })
      assert(offending.isEmpty, s"index side shuffles:\n$plan")
      val want = DedupQueries.queries("dedup_containment_incremental")
        .fn(spark, TestSpark.Sf0001).collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == want && want.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
