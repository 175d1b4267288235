package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming frequent-items landing — the [[TopFreq]] Misra-Gries summary
  * maintained live by an idempotent foreachBatch sink (the
  * [[GapfillSink]]/[[UpsertSink]] discipline: applied-batch manifest as
  * the replay gate, two-rename atomic publish). Each micro-batch's raw
  * rows are absorbed by counter-sum + one per-grain re-compression
  * ([[TopFreq.absorb]]); the landed state is k rows per grain FOREVER,
  * no matter how much traffic streams through — bounded-state heavy-
  * hitter tracking with an explicit error ledger, the serving twin of
  * the exact batch `events_heavy_hitters` anchor. */
object FreqSink {

  def applyBatch(spark: SparkSession, base: String, key: Column, grain: Column,
                 k: Int)(batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = TopFreq.absorb(Snapshots.current(spark, base), batch, key, grain, k)
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The landed per-grain summary table. */
  def summary(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no freq summary at $base"))

  /** All grains collapsed to one capacity-k summary (key, cnt, err). */
  def merged(spark: SparkSession, base: String, k: Int): DataFrame =
    TopFreq.merge(summary(spark, base), k)
}
