package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r11 (#8b) — per-source DUPLICATION-BUDGET alarm, the [[FreqSink]]
  * sink-family pattern applied to dedup governance: the landed state is
  * the (content_hash, source, n) counter table — digests only, mergeable
  * by counter sum, idempotent via the [[Snapshots]] applied-batch
  * manifest + two-rename publish. Each arriving batch adds its per-
  * (hash, source) counts; [[report]] then reads the ALARM table a corpus
  * owner pages on: per source, how many landed documents sit in content
  * groups seen more than once corpus-wide, as a per-mille rate against a
  * budget.
  *
  * The final-state report is EXACTLY the batch `dedup_source_report`'s
  * (n_docs, n_dup_docs) columns (the spec pins it on replay): dup
  * membership is derived from the landed counter table, so a document
  * that arrived BEFORE its duplicate still counts once the duplicate
  * lands — the retrospective semantics the batch query has, maintained
  * incrementally. State is Σ distinct (hash, source) rows — never text,
  * never pairs. */
object DupBudgetSink {

  private def countsOf(batch: DataFrame): DataFrame =
    batch.select(md5(col("text")).as("h"), col("source"))
      .groupBy("h", "source").agg(count(lit(1)).as("n"))

  def applyBatch(spark: SparkSession, base: String)(batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = Snapshots.current(spark, base) match {
      case None => countsOf(batch)
      case Some(prior) => prior.unionByName(countsOf(batch))
        .groupBy("h", "source").agg(sum(col("n")).as("n"))
    }
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The alarm table: (source, n_docs, n_dup_docs, dup_pm, alarm). */
  def report(spark: SparkSession, base: String, budgetPm: Long): DataFrame = {
    val state = Snapshots.current(spark, base)
      .getOrElse(sys.error(s"no dup-budget state at $base"))
    val totals = state.groupBy("h").agg(sum(col("n")).as("total"))
    state.join(totals, Seq("h"))
      .groupBy("source")
      .agg(sum(col("n")).as("n_docs"),
        sum(when(col("total") > 1, col("n")).otherwise(0L)).as("n_dup_docs"))
      .withColumn("dup_pm", expr("n_dup_docs * 1000 div greatest(n_docs, 1)"))
      .withColumn("alarm", col("dup_pm") > budgetPm)
  }
}
