package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries frequent-items summary, represented the Spark-first
  * way (the [[CountMin]] / HLL-layer discipline): a TABLE of
  * (grain, key, cnt, err) rather than an opaque blob. Build is one keyed
  * count plus a per-grain top-k window; merging grains is groupBy-sum plus
  * one re-compression; the summary persists/compacts like any dataset.
  *
  * The MG construction from exact per-grain counts: keep each grain's top-k
  * counters, decremented by the (k+1)-th largest count c₍ₖ₊₁₎ (the valid
  * mergeable-summaries form, Agarwal et al., PODS'12). `err` records that
  * decrement. The trade is the MIRROR IMAGE of count-min's: estimates are
  * never ABOVE the true count, and undershoot by at most the summed `err`
  * (≤ N/(k+1) per grain) — so any key whose true count exceeds the error
  * ledger is GUARANTEED present, which is exactly the φ-heavy-hitter
  * contract. At 100 TB the summary is k rows per grain no matter how many
  * distinct keys stream through; only the per-(grain,key) count shuffle
  * sees the raw data, with map-side partials.
  */
object TopFreq {

  /** Per-grain capacity-k summary: (grain, key, cnt, err) with `err`
    * constant within a grain. The top-k window sorts only the per-grain
    * COUNT table (distinct keys per grain), not the raw stream, and
    * Spark plans the rank filter with partial WindowGroupLimit (map-side
    * top-k cap). */
  def build(df: DataFrame, key: Column, grain: Column, k: Int): DataFrame = {
    val counts = df.select(grain.as("grain"), key.as("key"))
      .groupBy("grain", "key").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grain")).orderBy(col("cnt").desc, col("key"))
    val ranked = counts.withColumn("rn", row_number().over(w))
    val dec = ranked.groupBy("grain")
      .agg(coalesce(max(when(col("rn") === k + 1, col("cnt"))), lit(0L)).as("err"))
    ranked.where(col("rn") <= k)
      .join(dec, "grain")
      .select(col("grain"), col("key"),
        greatest(col("cnt") - col("err"), lit(0L)).as("cnt"), col("err"))
      .where(col("cnt") > 0)
  }

  /** Collapse per-grain summaries into one capacity-k summary
    * (key, cnt, err): counter sums per key, one re-compression, and the
    * error ledger = Σ per-grain err + the merge decrement. The global
    * window runs over ≤ |grains|·k rows — bounded by construction, the
    * same argument as the Zipf top-k. */
  def merge(summary: DataFrame, k: Int): DataFrame = {
    val baseErr = summary.groupBy("grain").agg(max(col("err")).as("e"))
      .agg(coalesce(sum(col("e")), lit(0L)).as("base_err"))
    val summed = summary.groupBy("key").agg(sum(col("cnt")).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("key"))
    val ranked = summed.withColumn("rn", row_number().over(w))
    val dec = ranked
      .agg(coalesce(max(when(col("rn") === k + 1, col("cnt"))), lit(0L)).as("dec"))
    ranked.where(col("rn") <= k)
      .crossJoin(broadcast(dec))
      .crossJoin(broadcast(baseErr))
      .select(col("key"),
        greatest(col("cnt") - col("dec"), lit(0L)).as("cnt"),
        (col("base_err") + col("dec")).as("err"))
      .where(col("cnt") > 0)
  }
}
