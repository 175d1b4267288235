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

  // ----------------------------------------------- compaction planning

  /** Target shard payload in characters. Test-scale-sized so every SF
    * produces a multi-shard plan per source; a production run sets this
    * to the parquet sweet spot (≈512 MB–1 GB of raw payload). */
  private val CompactTargetChars = 2000L

  /** §8p(cq) — small-file compaction planner: documents stream into the
    * lake as many tiny per-source drops, and the table needs a
    * deterministic plan that packs them into ~[[CompactTargetChars]]-sized
    * output shards WITHOUT a global sort. Per source, docs in doc_id order
    * fill shards first-fit: shard = (running payload BEFORE this doc) div
    * target — one window cumsum per source partition (the same
    * per-block-sort knob as the SNM family: block granularity bounds the
    * per-task sort; sources are the natural compaction unit because
    * cross-source packing would destroy partition pruning). Output is one
    * row per planned shard — the manifest a compaction executor consumes;
    * the plan is a pure function of the table, so a re-run after a crash
    * re-derives the identical manifest (the [[graft.pipeline.Snapshots]]
    * idempotence philosophy at the file level). */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables(dir).documents
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("shard", expr(s"(cum - n_chars) div $CompactTargetChars"))
      .groupBy(col("source"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  private val compactionPlanSql =
    s"""WITH c AS (
       |  SELECT source, doc_id, n_chars,
       |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM documents)
       |SELECT source, CAST((cum - n_chars) // $CompactTargetChars AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2
       |ORDER BY source, shard""".stripMargin

  // ------------------------------------------------- z-order layout

  private val ZFiles = 256          // value-range cells per layout
  private val ZCellWidth = 1L << 24 // 2^32 z-space / 256 cells
  private val PredLoPct = 10L       // predicate band on l_partkey: [10%, 12%]
  private val PredHiPct = 12L

  /** Bit-spread of a 16-bit value to even bit positions (the classic
    * magic-number interleave), rendered for either engine's SQL dialect
    * via `shl`. Pure integer arithmetic → bit-identical everywhere. */
  private def zSpread(v: String, shl: (String, Int) => String): String = {
    val s1 = s"((($v) | ${shl(v, 8)}) & 16711935)"
    val s2 = s"(($s1 | ${shl(s1, 4)}) & 252645135)"
    val s3 = s"(($s2 | ${shl(s2, 2)}) & 858993459)"
    s"(($s3 | ${shl(s3, 1)}) & 1431655765)"
  }
  private def sparkShl(e: String, n: Int) = s"shiftleft($e, $n)"
  private def duckShl(e: String, n: Int) = s"(($e) << $n)"

  /** §8p(cr) — Z-order vs linear layout audit: would clustering the fact
    * table on the interleaved (orderkey, partkey) curve let a partkey
    * predicate prune files that orderkey-ordered files cannot? Both keys
    * are range-scaled to 16 bits, interleaved with the magic-number
    * spread, and rows fall into [[ZFiles]] VALUE-RANGE cells per layout
    * (`z div cell` / `orderkey-scaled div cell`) — value bucketing, not
    * row_number, so no layout needs a global sort and the plan is one
    * scan + one (layout, file)-keyed aggregate (the per-row 2-way explode
    * replaces two passes). Per layout the audit reports file count, files
    * whose [min,max] partkey zone overlaps the fixed 2 %-band predicate,
    * rows inside those files, and the pruned fraction in per-mille — the
    * number a 100 TB table owner reads before paying for a re-cluster:
    * linear files each span the whole partkey domain (prune ≈ 0), z-cells
    * span ≈ 1/16 of it (prune ≈ 15/16). Scaling rides the DECIMAL/HUGEINT
    * lane so a 6e18 orderkey cannot overflow the ×65536. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val maxes = Tables(dir).lineitem.agg(
      max(col("l_orderkey")).as("max_o"), max(col("l_partkey")).as("max_p"))
    val xy = Tables(dir).lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .crossJoin(broadcast(maxes))
      .withColumn("x", expr("CAST(CAST(l_orderkey AS DECIMAL(38,0)) * 65536 div (max_o + 1) AS BIGINT)"))
      .withColumn("y", expr("CAST(CAST(l_partkey AS DECIMAL(38,0)) * 65536 div (max_p + 1) AS BIGINT)"))
      .withColumn("z", expr(s"${zSpread("x", sparkShl)} | ${sparkShl(zSpread("y", sparkShl), 1)}"))
      .withColumn("lin_file", expr(s"CAST(CAST(l_orderkey AS DECIMAL(38,0)) * $ZFiles div (max_o + 1) AS BIGINT)"))
      .withColumn("z_file", expr(s"z div $ZCellWidth"))
      .withColumn("lo", expr(s"max_p * $PredLoPct div 100"))
      .withColumn("hi", expr(s"max_p * $PredHiPct div 100"))
    val perFile = xy
      .select(col("l_partkey"), col("lo"), col("hi"),
        explode(array(
          struct(lit("linear").as("layout"), col("lin_file").as("file")),
          struct(lit("zorder").as("layout"), col("z_file").as("file")))).as("a"))
      .groupBy(col("a.layout").as("layout"), col("a.file").as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_p"),
        max(col("l_partkey")).as("max_p"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
    perFile
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("min_p") <= col("hi") && col("max_p") >= col("lo"), 1L)
          .otherwise(0L)).as("files_hit"),
        sum(when(col("min_p") <= col("hi") && col("max_p") >= col("lo"), col("n_rows"))
          .otherwise(0L)).as("rows_hit"))
      .withColumn("prune_pm", expr("(n_rows - rows_hit) * 1000 div n_rows"))
  }

  private val zorderLayoutSql = {
    val zx = zSpread("x", duckShl)
    val zy = zSpread("y", duckShl)
    s"""WITH m AS (SELECT MAX(l_orderkey) AS max_o, MAX(l_partkey) AS max_p FROM lineitem),
       |xy AS (
       |  SELECT l_partkey,
       |    CAST(CAST(l_orderkey AS HUGEINT) * 65536 // (max_o + 1) AS BIGINT) AS x,
       |    CAST(CAST(l_partkey AS HUGEINT) * 65536 // (max_p + 1) AS BIGINT) AS y,
       |    CAST(CAST(l_orderkey AS HUGEINT) * $ZFiles // (max_o + 1) AS BIGINT) AS lin_file,
       |    max_p * $PredLoPct // 100 AS lo, max_p * $PredHiPct // 100 AS hi
       |  FROM lineitem, m),
       |z AS (SELECT l_partkey, lo, hi, lin_file,
       |        ($zx | (($zy) << 1)) // $ZCellWidth AS z_file
       |      FROM xy),
       |assigned AS (
       |  SELECT 'linear' AS layout, lin_file AS file, l_partkey, lo, hi FROM z
       |  UNION ALL
       |  SELECT 'zorder', z_file, l_partkey, lo, hi FROM z),
       |per_file AS (
       |  SELECT layout, file, COUNT(*) AS n_rows,
       |    MIN(l_partkey) AS min_p, MAX(l_partkey) AS max_p,
       |    MIN(lo) AS lo, MIN(hi) AS hi
       |  FROM assigned GROUP BY 1, 2)
       |SELECT layout, COUNT(*) AS n_files, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       |  CAST(SUM(CASE WHEN min_p <= hi AND max_p >= lo THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(SUM(CASE WHEN min_p <= hi AND max_p >= lo THEN n_rows ELSE 0 END) AS BIGINT) AS rows_hit,
       |  (CAST(SUM(n_rows) AS BIGINT) - CAST(SUM(CASE WHEN min_p <= hi AND max_p >= lo THEN n_rows ELSE 0 END) AS BIGINT))
       |    * 1000 // CAST(SUM(n_rows) AS BIGINT) AS prune_pm
       |FROM per_file GROUP BY layout
       |ORDER BY layout""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "zone_map_stats" -> Q(zoneMapStats _, zoneMapStatsSql, Seq(col("column"))),
    "csr_column_profile" -> Q(columnProfile _, columnProfileSql, Seq(col("column"))),
    "storage_compaction_plan" -> Q(compactionPlan _, compactionPlanSql,
      Seq(col("source"), col("shard"))),
    "storage_zorder_layout" -> Q(zorderLayout _, zorderLayoutSql, Seq(col("layout"))),
  )
}
