package graft.pipeline

import graft.operators.SubstringDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming window-hash census landing — the exact-substring family's
  * incremental twin (every other dedup family has one; this closes the
  * gap). The landed state is the (wh, cnt) OCCURRENCE register of
  * [[SubstringDedup.censusOf]]: counts are a mergeable integer register
  * (union + re-sum), so any partition of the corpus into micro-batches
  * folds to the same census as one batch pass — the
  * [[FreqSink]]/[[HllSink]] sink discipline with the [[Snapshots]]
  * applied-batch manifest as the replay gate and the two-rename atomic
  * publish.
  *
  * Scale shape: per batch, ONE wh-keyed aggregate over the batch's
  * windows plus one keyed merge against the landed register — the only
  * shuffle key is wh, identical to the batch census front. The landed
  * table grows with DISTINCT windows in the corpus (the honest bound —
  * it IS the census), and a deployment that only needs the duplicated
  * tail can compact rows at cnt = 1 into a bloom/CountMin side table.
  *
  * Scoring: [[coverage]] reproduces `dedup_substring_coverage` exactly
  * once the full corpus has landed (spec-pinned bit-for-bit in
  * CensusSinkSpec); called mid-stream it scores arriving docs against
  * the corpus-so-far, a monotone lower bound per document. */
object CensusSink {

  def applyBatch(spark: SparkSession, base: String)(batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val add = SubstringDedup.censusOf(batch)
    val merged = Snapshots.current(spark, base) match {
      case Some(cur) => cur.unionByName(add)
        .groupBy(col("wh")).agg(sum(col("cnt")).as("cnt"))
      case None => add
    }
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The landed (wh, cnt) occurrence register. */
  def census(spark: SparkSession, base: String): DataFrame =
    Snapshots.current(spark, base).getOrElse(sys.error(s"no census at $base"))

  /** Duplicated-span coverage of `docs` against the landed census —
    * (doc_id, n_windows, dup_windows, dup_permille), the
    * `dedup_substring_coverage` shape. */
  def coverage(spark: SparkSession, base: String, docs: DataFrame): DataFrame =
    SubstringDedup.coverageAgainst(docs, census(spark, base))
}
