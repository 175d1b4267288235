package graft.pipeline

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus pipeline under the Dag: runs once, no-ops when
  * nothing changed, re-runs the cone on a document drop. */
class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCfg(): CorpusConfig = {
    val root = Files.createTempDirectory("graft-corpus-pipe")
    val docsDir = s"$root/docs"
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .write.parquet(docsDir)
    CorpusConfig(docsDir, s"$root/work", root.resolve("signals"))
  }

  test("full run, no-op rerun, and cone re-run on a new document drop") {
    val cfg = freshCfg()
    val first = CorpusPipeline.run(spark, cfg)
    assert(first.ran == Seq("quality_gate", "dedup", "pack", "rebalance", "skew_report"))
    assert(first.skipped.isEmpty)

    // outputs are consistent: dedup ⊆ gated, packed rows = deduped rows,
    // rebalance conserves rows+tokens, skew has one row per shard
    val gated = spark.read.parquet(s"${cfg.workDir}/gated")
    val deduped = spark.read.parquet(s"${cfg.workDir}/deduped")
    val packed = spark.read.parquet(s"${cfg.workDir}/packed")
    val balanced = spark.read.parquet(s"${cfg.workDir}/balanced")
    assert(deduped.count() <= gated.count() && deduped.count() > 0)
    assert(packed.count() == deduped.count())
    assert(balanced.count() == packed.count())
    assert(balanced.agg(sum("n_tokens")).head.getLong(0) ==
      packed.agg(sum("n_tokens")).head.getLong(0))
    val skew = spark.read.parquet(s"${cfg.workDir}/skew")
    assert(skew.count() == balanced.select("shard").distinct().count())

    // unchanged input → complete no-op
    val second = CorpusPipeline.run(spark, cfg)
    assert(second.ran.isEmpty)
    assert(second.skipped == Seq("quality_gate", "dedup", "pack", "rebalance", "skew_report"))

    // drop new documents → the whole cone re-runs
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .where(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .write.mode("append").parquet(cfg.docsDir)
    val third = CorpusPipeline.run(spark, cfg)
    assert(third.ran == Seq("quality_gate", "dedup", "pack", "rebalance", "skew_report"))
  }
}
