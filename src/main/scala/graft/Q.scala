package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver's DuckDB oracle runs on the same parquet
  * tables. `oracle == None` → the driver records a rows-only check.
  *
  * `sort` is the canonical OUTPUT ordering applied by [[Verify]] only —
  * operators return unsorted plans (a global sort of a 100 TB result purely
  * for compare-stability would be a full-cluster sort; it belongs to the
  * harness, not the operator). It must mirror the oracle SQL's ORDER BY.
  */
final case class Q(fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String],
                   sort: Seq[Column] = Nil)

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q = Q(fn, Some(sql))
  def apply(fn: (SparkSession, String) => DataFrame, sql: String, sort: Seq[Column]): Q =
    Q(fn, Some(sql), sort)
}
