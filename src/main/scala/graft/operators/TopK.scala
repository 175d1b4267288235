package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed per-key top-k without a per-key full sort.
  *
  * Phase 1 reduces each input partition to ≤k candidates per key (map-side
  * partial aggregation — `spark_partition_id` pins every group to one
  * partition, so the shuffle carries at most k rows per (key, partition)
  * instead of the whole scored set). Phase 2 merges the per-partition
  * winners. At 100 TB this is the difference between shuffling the entire
  * corpus-score matrix and shuffling ~k × num_partitions rows per probe.
  *
  * Ranking is (score DESC, id ASC) — encoded as lexicographic descending
  * sort of struct(score, -id), which the DuckDB oracle mirrors with
  * ROW_NUMBER() OVER (ORDER BY score DESC, id ASC).
  */
object TopK {

  /** df must expose `keyCol` (grouping key), `scoreCol` (double), `idCol`
    * (long, unique tie-break). Returns (key, rank, id, score). */
  def perKey(df: DataFrame, keyCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    val item: Column = struct(col(scoreCol), (-col(idCol)).as("_nid"), col(idCol).as("_id"))
    val phase1 = df
      .withColumn("_part", spark_partition_id())
      .groupBy(col(keyCol), col("_part"))
      .agg(slice(reverse(array_sort(collect_list(item))), 1, k).as("_top"))
      .select(col(keyCol), explode(col("_top")).as("_it"))
    phase1
      .groupBy(col(keyCol))
      .agg(slice(reverse(array_sort(collect_list(col("_it")))), 1, k).as("_top"))
      .select(col(keyCol), posexplode(col("_top")).as(Seq("_pos", "_it")))
      .select(
        col(keyCol),
        (col("_pos") + 1).cast("long").as("rank"),
        col(s"_it._id").as(idCol),
        col(s"_it.$scoreCol").as(scoreCol))
  }
}
