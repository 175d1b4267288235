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

  // ------------------------------------------------------ column profile

  private val ProfileCols = Seq("c_custkey", "c_nationkey", "c_mktsegment")

  /** Staging-table column profile (null rate, cardinality, range) — the
    * pre-load sanity check an ETL operator runs before mapping a source
    * (the reference does this by eye over CSVs; here it is one query).
    * SINGLE pass over the table: every per-column measure lives in one
    * aggregate (Spark plans the multi-distinct via expand — still one
    * scan), then the wide row is exploded into one row per column. Values
    * travel as strings so one schema profiles every column type. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val entries = ProfileCols.map { c =>
      struct(lit(c).as("column"), col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_value"), col(s"max_$c").as("max_value"))
    }
    Tables(dir).customer
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("e"), col("n_rows"))
      .select(col("e.column").as("column"), col("n_rows"), col("e.n_nulls").as("n_nulls"),
        col("e.n_distinct").as("n_distinct"), col("e.min_value").as("min_value"),
        col("e.max_value").as("max_value"))
  }

  private val columnProfileSql = {
    val measures = ProfileCols.map { c =>
      s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
         |    COUNT(DISTINCT $c) AS nd_$c,
         |    CAST(MIN($c) AS VARCHAR) AS min_$c, CAST(MAX($c) AS VARCHAR) AS max_$c""".stripMargin
    }.mkString(",\n    ")
    val rows = ProfileCols.map { c =>
      s"""SELECT '$c' AS "column", n_rows, nn_$c AS n_nulls, nd_$c AS n_distinct,
         |  min_$c AS min_value, max_$c AS max_value FROM a""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n_rows,
       |    $measures
       |  FROM customer)
       |SELECT * FROM (
       |  $rows
       |) ORDER BY "column"""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "zone_map_stats" -> Q(zoneMapStats _, zoneMapStatsSql, Seq(col("column"))),
    "csr_column_profile" -> Q(columnProfile _, columnProfileSql, Seq(col("column"))),
  )
}
