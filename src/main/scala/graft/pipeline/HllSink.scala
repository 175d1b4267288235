package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming distinct-count landing — [[HllTable]] registers maintained
  * live by an idempotent foreachBatch sink (the [[FreqSink]]/[[QuantSink]]
  * discipline: applied-batch manifest as the replay gate, two-rename
  * atomic publish). Register MAX is exact-mergeable, so like QuantSink
  * the landed state after any prefix of batches is bit-identical to a
  * one-shot build — live distinct-user dashboards with ≤256 rows of
  * state per grain forever. Completes the sketch-landing trio: counts
  * (FreqSink, bounded-error), quantiles (QuantSink, exact-merge),
  * cardinality (this, exact-merge). */
object HllSink {

  def applyBatch(spark: SparkSession, base: String, key: Column, grain: Column)
                (batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = HllTable.absorb(Snapshots.current(spark, base), batch, key, grain)
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The landed per-grain register table. */
  def summary(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no hll summary at $base"))

  /** Cardinality estimates straight off the landed registers. */
  def estimates(spark: SparkSession, base: String): DataFrame =
    HllTable.estimate(summary(spark, base))
}
