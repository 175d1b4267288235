package graft.operators

import graft.Q
import graft.pipeline.ZoneMap
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the file-level zone-map manifest (SURVEY §8e).
  *
  * Mirrors the reference's staging-area bookkeeping (checksum manifests in
  * `scripts/sync.py:113`, `scripts/checksum.py:13`) lifted from "content
  * hash per file" to "queryable per-file column statistics": at 100 TB the
  * loader consults the manifest to skip whole files before listing them.
  */
object StorageQueries {

  /** Zone-map build folded to global per-column stats. The interesting part
    * is the per-file pass ([[ZoneMap.build]]: one distributed scan keyed on
    * `input_file_name()`); the fold proves the manifest is lossless — the
    * per-file mins/maxes/counts recombine to exactly the table-wide stats
    * DuckDB computes directly. All three columns are BIGINT so one cast
    * covers the fold; mixed dtypes are exercised in ZoneMapSpec. */
  def zoneMapStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val zm = ZoneMap.build(Tables(dir).lineitem, Seq("l_orderkey", "l_partkey", "l_suppkey"))
    zm.groupBy(col("column"))
      .agg(
        min(col("min_value").cast("bigint")).cast("string").as("min_value"),
        max(col("max_value").cast("bigint")).cast("string").as("max_value"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"))
  }

  private val zoneMapStatsSql =
    """SELECT * FROM (
      |  SELECT 'l_orderkey' AS "column",
      |    CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
      |    CAST(MAX(l_orderkey) AS VARCHAR) AS max_value,
      |    COUNT(*) AS n_rows,
      |    CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_partkey',
      |    CAST(MIN(l_partkey) AS VARCHAR), CAST(MAX(l_partkey) AS VARCHAR),
      |    COUNT(*),
      |    CAST(COALESCE(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey',
      |    CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR),
      |    COUNT(*),
      |    CAST(COALESCE(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM lineitem
      |) ORDER BY "column"""".stripMargin

  val queries: Map[String, Q] = Map(
    "zone_map_stats" -> Q(zoneMapStats _, zoneMapStatsSql, Seq(col("column"))),
  )
}
