package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver's DuckDB oracle runs on the same parquet
  * tables. `oracle == None` → the driver records a rows-only check.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q = Q(fn, Some(sql))
}
