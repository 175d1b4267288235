package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming FEATURE-STORE landing — the per-user feature matrix
  * (`events_user_features`) maintained live by an idempotent foreachBatch
  * sink, completing the mergeable-landing family (counts [[FreqSink]],
  * quantiles [[QuantSink]], cardinalities [[HllSink]], features here).
  *
  * The landed state is not the feature VIEW but its MERGEABLE REGISTERS:
  * per user — event/type counts, first/last event time, the exact
  * DECIMAL value sum, the max value, and the distinct active-day SET
  * (bounded by the corpus's day span, the one feature a count can't
  * merge). Every register merges exactly (sums add, min/min max/max,
  * day sets union), so landed state after ANY batch prefix is
  * bit-identical to a one-shot build over the same rows — replay
  * idempotence (the [[Snapshots]] manifest gate) composes with merge
  * exactness into full crash-equivalence. The feature view derives from
  * registers on demand with the SAME expressions as the batch query, so
  * served features match `events_user_features` column-for-column. */
object FeatureSink {

  private val DayUs = 86400000000L
  private val Dec = org.apache.spark.sql.types.DecimalType(28, 6)

  /** Per-user mergeable registers of one event frame. */
  def registers(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"),
        sort_array(collect_set(expr("us div 86400000000"))).as("days"),
        sum(col("value").cast(Dec)).as("sum_value"),
        max(col("value")).as("max_value"))

  /** Exact register merge: sums add, extrema fold, day sets union. */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns
    a.unionByName(b.select(cols.map(col): _*))
      .groupBy("user_id")
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("n_purchase")).as("n_purchase"),
        sum(col("n_view")).as("n_view"),
        sum(col("n_click")).as("n_click"),
        min(col("first_us")).as("first_us"), max(col("last_us")).as("last_us"),
        sort_array(array_distinct(flatten(collect_list(col("days"))))).as("days"),
        sum(col("sum_value")).as("sum_value"),
        max(col("max_value")).as("max_value"))
  }

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

  /** The landed register table. */
  def state(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no feature state at $base"))

  /** The feature VIEW off the registers — the exact expressions of the
    * batch `events_user_features`, with the corpus horizon derived from
    * the registers themselves (max last event time). */
  def features(registersDf: DataFrame): DataFrame = {
    val horizon = registersDf.agg(max(col("last_us")).as("h_us"))
    registersDf.crossJoin(broadcast(horizon))
      .select(col("user_id"), col("n_events"), col("n_purchase"), col("n_view"),
        col("n_click"),
        expr("(last_us - first_us) div 86400000000").as("tenure_days"),
        expr("(h_us - last_us) div 86400000000").as("recency_days"),
        size(col("days")).cast("long").as("n_active_days"),
        col("sum_value").cast("double").as("monetary"),
        round(col("sum_value").cast("double") / col("n_events"), 6).as("avg_value"),
        col("max_value"))
  }
}
