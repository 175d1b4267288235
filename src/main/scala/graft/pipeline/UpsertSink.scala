package graft.pipeline



import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent MERGE sink for a CDC upsert stream — the landing half of
  * [[graft.streaming.CdcStream]]: each micro-batch of latest-wins change
  * records folds into a keyed parquet dimension snapshot, exactly once.
  *
  * Mechanics per batch:
  *   1. **Idempotency gate** — the applied-batch manifest (one line per
  *      batchId) is consulted first; a re-delivered batch (foreachBatch
  *      replays after crash) is a silent no-op. This is what makes the
  *      sink safe under Structured Streaming's at-least-once foreachBatch
  *      contract.
  *   2. **Merge** — current snapshot ∪ batch, latest change per key wins
  *      (seq = (o_orderdate, o_orderkey) — the same order the compaction
  *      upstream uses); 'D' ops delete the key.
  *   3. **Atomic swap** — the new snapshot writes to `v<batchId>`, then a
  *      two-rename pointer swap publishes it (readers never see a partial
  *      write; a crash mid-swap leaves the previous snapshot live) — the
  *      same discipline as [[AggCache]].
  *
  * At scale the merge is one shuffle on the key over snapshot ∪ batch;
  * a deployment with huge dimensions would partition the snapshot by key
  * range and rewrite only touched partitions — the manifest/swap
  * machinery is unchanged by that refinement. */
object UpsertSink {

  /** Applied-batch ids (empty at bootstrap). */
  def appliedBatches(base: String): Set[Long] = Snapshots.appliedBatches(base)

  /** The live snapshot (empty frame with the right schema at bootstrap). */
  def snapshot(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(
      spark.emptyDataFrame
        .select(lit(0L).as("c_custkey"),
          lit(java.sql.Timestamp.valueOf("1970-01-01 00:00:00")).as("o_orderdate"),
          lit(0L).as("o_orderkey"), lit("U").as("op"), lit(0.0).as("new_bal"))
        .where(lit(false)))

  /** foreachBatch handler: fold one batch of LatestChange rows in. */
  def applyBatch(spark: SparkSession, base: String)(batch: DataFrame, batchId: Long): Unit = {
    if (appliedBatches(base).contains(batchId)) return // replay → no-op
    val all = snapshot(spark, base).unionByName(
      batch.select("c_custkey", "o_orderdate", "o_orderkey", "op", "new_bal"))
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val merged = all.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      .where(col("op") =!= "D") // deletes drop the key from the snapshot
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }
}
