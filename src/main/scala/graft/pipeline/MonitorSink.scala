package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming EXPERIMENT MONITOR — the always-valid mSPRT
  * (`events_msprt`) and the SRM validity check (`events_srm_check`)
  * maintained live by an idempotent foreachBatch sink. This is the
  * monitor's natural deployment shape: mSPRT's whole point is that Λ may
  * be read after EVERY micro-batch and the first ln(1/α) crossing is a
  * valid stop — but only if replayed/redelivered batches cannot double
  * an arrival count, which is exactly the [[Snapshots]] manifest gate
  * plus register-merge exactness.
  *
  * The landed state is the per-hour arm-count table (h, n_a, n_b) — the
  * minimal sufficient statistic for BOTH readouts, purely ADDITIVE so
  * merge is a keyed sum and landed state after any batch prefix is
  * bit-identical to a one-shot build. The views re-run the batch
  * queries' exact expressions over the registers, so a monitor read
  * after the final batch equals `events_msprt` / `events_srm_check`
  * column-for-column (pinned by MonitorSinkSpec). */
object MonitorSink {

  /** Per-hour mergeable arm counts of one event frame (the
    * [[graft.operators.EventAnalytics.abArm]] content-keyed deal, so
    * arrival order and batch boundaries cannot move a user). */
  def registers(events: DataFrame): DataFrame = {
    graft.plans.VectorExpressions.register(events.sparkSession)
    events
      .select(expr("unix_micros(ts) div 3600000000").as("h"),
        graft.operators.EventAnalytics.abArm.as("arm"))
      .groupBy("h")
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
  }

  /** Exact register merge: pure keyed addition. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b.select(a.columns.map(col): _*))
      .groupBy("h")
      .agg(sum(col("na")).as("na"), sum(col("nb")).as("nb"))

  def absorb(state: Option[DataFrame], batch: DataFrame): DataFrame = {
    val br = registers(batch)
    state.map(merge(_, br)).getOrElse(br)
  }

  /** foreachBatch body: exactly-once via the applied-batch manifest,
    * atomic two-rename publish. */
  def applyBatch(spark: SparkSession, base: String)(batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = absorb(Snapshots.current(spark, base), batch)
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  def state(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no monitor state at $base"))

  private val Tau2 = 100.0
  private val Crit = 2.995732

  /** The always-valid readout off the registers — the exact expressions
    * of the batch `events_msprt` (empty hours carry no row there either:
    * the batch query groups raw events, and an hour with zero arrivals
    * adds nothing to the cumulative sums). */
  def msprt(registersDf: DataFrame): DataFrame = {
    val w = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    registersDf
      .where(col("na") + col("nb") > 0)
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .select(col("h"), col("ca"), col("cb"),
        expr(s"""round(0.5 * ln(CAST(ca + cb AS DOUBLE) / (ca + cb + $Tau2))
                | + CAST(ca - cb AS DOUBLE) * (ca - cb) * $Tau2
                |   / (2.0 * (ca + cb) * (ca + cb + $Tau2)), 6)"""
          .stripMargin.replace("\n", " ")).as("log_lr"))
      .withColumn("significant", col("log_lr") > Crit)
  }

  /** The per-day SRM table off the registers — the exact expressions of
    * the batch `events_srm_check` (hour index → UTC day, the session
    * timezone contract). */
  def srm(registersDf: DataFrame): DataFrame =
    registersDf
      .where(col("na") + col("nb") > 0)
      .groupBy(expr("CAST(to_date(timestamp_micros(h * 3600000000)) AS STRING)").as("day"))
      .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
      .select(col("day"), col("n_a"), col("n_b"),
        expr("round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)").as("chi2"))
      .withColumn("srm", col("chi2") > 10.83)
}
