package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming quantile-summary landing — [[QuantHist]] maintained live by
  * an idempotent foreachBatch sink (the [[FreqSink]] discipline: applied-
  * batch manifest as the replay gate, two-rename atomic publish). Because
  * QuantHist's merge is EXACT counter addition, the landed state after
  * any prefix of batches is bit-identical to a batch build over the same
  * rows — no error ledger to carry, and replay idempotence composes with
  * merge exactness into full crash-equivalence (spec-pinned). State is
  * the bounded bin table per grain forever. */
object QuantSink {

  def applyBatch(spark: SparkSession, base: String, value: Column, grain: Column)
                (batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = QuantHist.absorb(Snapshots.current(spark, base), batch, value, grain)
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The landed per-grain bin table. */
  def summary(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no quantile summary at $base"))

  /** Quantile reads straight off the landed state. */
  def quantiles(spark: SparkSession, base: String, qPm: Seq[Int]): DataFrame =
    QuantHist.quantiles(summary(spark, base), qPm)
}
