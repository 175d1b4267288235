package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated parquet tables of one scale factor.
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning; no
  * caching here — operators decide what to persist. At cluster scale these
  * would be partitioned table paths; the API shape is the same.
  */
final case class Tables(dir: String)(implicit spark: SparkSession) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects outright; read the nanos as long and rebuild a microsecond
    * timestamp with integer division (epoch nanos exceed the double
    * mantissa, so no floating-point path is acceptable here). Matches
    * DuckDB's TIMESTAMP_NS → TIMESTAMP truncation.
    *
    * The nanosAsLong conf is set at session build time by GraftSession /
    * Verify / Bench; the guard below only covers externally-built sessions
    * and is idempotent (same value always), so no mid-session flip can
    * change any other read's schema. */
  def events: DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
