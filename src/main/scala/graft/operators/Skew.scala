package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY §5: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join splitting handles skewed JOINS at runtime; a skewed
  * AGGREGATION (one whale key receiving most rows) still lands on one
  * reducer. `saltedAgg` is the standard two-phase fix: aggregate on
  * (key, salt) first — spreading the whale across `buckets` reducers —
  * then merge the partials per key. Works for any algebraic aggregate
  * (sum/count/min/max); the caller provides both phases.
  */
object Skew {

  /** @param df       input
    * @param keys     grouping keys
    * @param buckets  salt fan-out (≈ number of reducers a whale key spreads over)
    * @param partial  phase-1 aggregates over raw rows (run per (keys, salt))
    * @param merge    phase-2 aggregates over the phase-1 columns (run per keys)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets > 0 && partial.nonEmpty && merge.nonEmpty)
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Convenience: skew-safe count + sum of `valueCol` per key. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 32): DataFrame =
    saltedAgg(df, keys, buckets,
      partial = Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      merge = Seq(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol")))
}
