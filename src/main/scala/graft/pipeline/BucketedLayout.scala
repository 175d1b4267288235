package graft.pipeline

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout for shuffle-free co-located joins — the storage
  * half of the 100 TB join story. Writing both sides of a recurring join
  * bucketed (and sorted) by the join key means every later join is a
  * zero-exchange sort-merge: each task reads bucket i of both tables,
  * already hash-clustered and sorted, so the cluster never moves either
  * fact table again. This is what "pre-partitioning" means durably —
  * `repartition` co-locates for ONE query; bucketing co-locates for every
  * query until the layout changes.
  *
  * The bucket count is the parallelism dial: pick it so one bucket of the
  * larger table fits an executor's memory at target scale (e.g. 100 TB /
  * 4096 buckets ≈ 25 GB — bucket counts must match on both sides, so
  * size for the bigger table and accept small buckets on the dimension).
  *
  * Uses the session catalog's external-parquet tables (`bucketBy` +
  * `sortBy` + explicit path) — no Hive dependency; the layout is plain
  * parquet plus bucket metadata any Spark session can re-register. */
object BucketedLayout {

  /** Write orders and customer bucketed+sorted by custkey under
    * `path/<name>`, registering catalog tables `<prefix>_orders` /
    * `<prefix>_customer` (replacing previous registrations). */
  def write(spark: SparkSession, dir: String, path: String,
            buckets: Int = 8, prefix: String = "bkt"): Unit = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    def save(df: DataFrame, name: String, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$name")
      df.write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$path/$name")
        .saveAsTable(s"${prefix}_$name")
    }
    save(t.orders, "orders", "o_custkey")
    save(t.customer, "customer", "c_custkey")
  }

  /** The recurring join, answered from the bucketed layout: per-customer
    * order rollup joined to customer attributes. With both sides bucketed
    * on the key, the plan has NO Exchange — asserted by the spec with
    * broadcast disabled, which is the honest configuration: at 100 TB
    * neither side broadcasts. */
  def colocatedOrdersPerCustomer(spark: SparkSession, prefix: String = "bkt"): DataFrame = {
    val orders = spark.table(s"${prefix}_orders")
    val customer = spark.table(s"${prefix}_customer")
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("o_orderkey"), col("o_totalprice"))
  }
}
