package graft.pipeline

import java.nio.file.Path

import graft.operators.CorpusQueries
import graft.streaming.DocStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-corpus pipeline configuration. */
final case class CorpusConfig(
    docsDir: String,    // input documents parquet directory
    workDir: String,    // staged outputs (gated/deduped/packed/balanced/skew)
    signalsDir: Path)

/** The training-data pipeline end-to-end, composed from graft operators
  * under the same [[Dag]] scheduler as the reference-shaped ETL
  * ([[GraftPipeline]]): the corpus analogue of sync → transform → load.
  *
  *  1. `quality_gate` — the batch twin of the streaming ingest gate
  *     ([[DocStreams.scored]], SAME columns): drop low-quality docs.
  *  2. `dedup` — exact content dedup; min doc_id survives per md5(text).
  *  3. `pack` — sequence packing of the deduped corpus
  *     ([[CorpusQueries.packAll]]).
  *  4. `rebalance` — whole-sequence shard rebalance ([[Shards.rebalance]]).
  *  5. `skew_report` — the per-shard load table after rebalancing.
  *
  * Done-signals are output-content signatures ([[GraftPipeline.doneSignal]]),
  * so an unchanged corpus is a no-op run and a drop of new documents
  * re-runs exactly the downstream cone — the property that matters when
  * step 3 onward is cheap metadata but steps 1–2 re-scan 100 TB. */
object CorpusPipeline {

  def build(spark: SparkSession, cfg: CorpusConfig): Dag = {
    graft.plans.VectorExpressions.register(spark) // hexPrefix in the shard bucket
    def sig(dir: String): String = GraftPipeline.doneSignal(spark, dir)

    def qualityGate(): String = {
      val docs = spark.read.parquet(cfg.docsDir)
      val keep = DocStreams.scored(docs).where(col("keep")).select(col("doc_id"))
      docs.join(keep, Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"${cfg.workDir}/gated")
      sig(s"${cfg.workDir}/gated")
    }

    def dedup(): String = {
      val gated = spark.read.parquet(s"${cfg.workDir}/gated")
      val keep = gated.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      gated.join(keep, Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"${cfg.workDir}/deduped")
      sig(s"${cfg.workDir}/deduped")
    }

    def pack(): String = {
      CorpusQueries.packAll(spark.read.parquet(s"${cfg.workDir}/deduped"))
        .write.mode("overwrite").parquet(s"${cfg.workDir}/packed")
      sig(s"${cfg.workDir}/packed")
    }

    def rebalance(): String = {
      Shards.rebalance(spark.read.parquet(s"${cfg.workDir}/packed"))
        .write.mode("overwrite").parquet(s"${cfg.workDir}/balanced")
      sig(s"${cfg.workDir}/balanced")
    }

    def skewReport(): String = {
      val balanced = spark.read.parquet(s"${cfg.workDir}/balanced")
      val loads = balanced.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      loads.withColumn("skew_pct",
          round((col("total_tokens") - avg(col("total_tokens"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy()))
            * lit(100.0) / avg(col("total_tokens"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy()), 4))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${cfg.workDir}/skew")
      sig(s"${cfg.workDir}/skew")
    }

    new Dag(Seq(
      Task("quality_gate", Nil, run = qualityGate _,
        externalInput = () => sig(cfg.docsDir)),
      Task("dedup", Seq("quality_gate"), dedup _),
      Task("pack", Seq("dedup"), pack _),
      Task("rebalance", Seq("pack"), rebalance _),
      Task("skew_report", Seq("rebalance"), skewReport _)))
  }

  /** Run with persistent `.done-<task>` signals under cfg.signalsDir. */
  def run(spark: SparkSession, cfg: CorpusConfig): DagReport =
    build(spark, cfg).execute(new FileSignalStore(cfg.signalsDir))
}
