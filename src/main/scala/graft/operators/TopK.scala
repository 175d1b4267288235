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

  /** Same contract as [[perKey]], executed by the custom
    * [[graft.plans.TopKPerKey]] operator (LogicalPlan + Strategy +
    * bounded-heap SparkPlan) instead of the two-phase aggregate: partial
    * exec filters each partition to ≤k rows per key map-side, the final
    * exec merges after a key-clustered exchange. Installs the planner
    * strategy on the session on first use (public ExperimentalMethods
    * hook, so driver-built sessions work too). */
  def perKeyExec(df: DataFrame, keyCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val spark = df.sparkSession
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.TopKStrategy
    val plan = GraftSqlBridge.logicalPlan(df)
    def attr(name: String) = plan.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    GraftSqlBridge.ofRows(spark,
      graft.plans.TopKPerKey(Seq(attr(keyCol)), attr(scoreCol), attr(idCol), k, plan))
  }

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
