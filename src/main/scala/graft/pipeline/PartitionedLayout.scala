package graft.pipeline

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout — the scan-pruning complement to
  * [[BucketedLayout]]'s join co-location. Facts land under
  * `day=YYYY-MM-DD/` directories; a reader with a date predicate then
  * touches only the matching directories (Catalyst partition pruning —
  * `PartitionFilters` in the scan, zero I/O for pruned days), which at
  * 100 TB is the difference between scanning a day and scanning a year.
  *
  * Partition column granularity is the dial: day-grain gives ~365
  * directories/year — coarse enough to avoid the small-file explosion
  * hour-grain causes (and [[Compaction]] exists for exactly that
  * cleanup), fine enough that typical report windows prune >95% of the
  * data. */
object PartitionedLayout {

  /** Land events date-partitioned at `path` (parquet, day= directories). */
  def writeEvents(spark: SparkSession, dir: String, path: String): Unit = {
    implicit val s: SparkSession = spark
    Tables(dir).events
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(path)
  }

  /** A windowed read over the partitioned layout: the day predicate must
    * reach the scan as a PartitionFilter (spec-asserted), never a
    * post-scan filter. */
  def readWindow(spark: SparkSession, path: String,
                 from: String, until: String): DataFrame =
    spark.read.parquet(path)
      .where(col("day") >= lit(from) && col("day") < lit(until))
}
