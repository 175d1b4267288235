package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitionedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("date window prunes partitions at the scan, answers match the raw filter") {
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    PartitionedLayout.writeEvents(spark, TestSpark.Sf0001, path)
    val all = spark.read.parquet(path)
    val days = all.select("day").distinct().count()
    assert(days > 10, s"need a multi-day table to prove pruning, got $days")

    val bounds = all.agg(min("day"), max("day")).collect()(0)
    val from = bounds.getDate(0).toLocalDate.plusDays(3).toString
    val until = bounds.getDate(0).toLocalDate.plusDays(6).toString

    val window = PartitionedLayout.readWindow(spark, path, from, until)
    val scan = window.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    // the day predicate must prune directories, not filter rows post-scan
    assert(scan.partitionFilters.nonEmpty, s"no partition filters:\n$scan")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= 3, s"window of 3 days read $selected partitions")

    implicit val s: org.apache.spark.sql.SparkSession = spark
    val want = graft.sources.Tables(TestSpark.Sf0001).events
      .where(to_date(col("ts")) >= lit(from) && to_date(col("ts")) < lit(until))
      .count()
    assert(window.count() == want && want > 0)
  }
}
