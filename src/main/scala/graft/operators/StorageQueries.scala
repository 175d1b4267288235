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

  /** Incremental twin of [[compactionPlan]] (the `foreachBatch` body of a
    * streaming compactor): extend a PRIOR manifest with a batch of newly
    * landed docs. Valid under the append-only contract the lake gives a
    * compactor anyway — batch doc_ids per source sort after everything
    * already planned (asserted nowhere at runtime: the spec pins the
    * equality, and a violating feed would diverge from the recompute
    * loudly at the next audit). First-fit state is just the per-source
    * cumulative payload, so the delta is: resume each source's cumsum at
    * `Σ total_chars` from the prior manifest, assign shards with the
    * SAME pre-payload formula, then merge rows by (source, shard) —
    * sum/min/max re-aggregation, the manifest's register algebra (a
    * batch that continues the prior tail shard merges into it exactly).
    * Replaying the whole table as one batch over an empty prior equals
    * [[compactionPlan]] bit-for-bit, and prefix+suffix equals the full
    * recompute — both spec-pinned. */
  def compactionDelta(prior: DataFrame, batch: DataFrame): DataFrame = {
    val tail = prior.groupBy("source")
      .agg(sum(col("total_chars")).as("prior_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val delta = batch
      .select(col("source"), col("doc_id"), col("n_chars"))
      .join(tail, Seq("source"), "left")
      .withColumn("prior_chars", coalesce(col("prior_chars"), lit(0L)))
      .withColumn("cum", sum(col("n_chars")).over(w) + col("prior_chars"))
      .withColumn("shard", expr(s"(cum - n_chars) div $CompactTargetChars"))
      .groupBy(col("source"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    prior.unionByName(delta)
      .groupBy("source", "shard")
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
  }

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
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    zorderLayoutImpl(spark, dir, forceDecimal = false)

  /** `forceDecimal` pins the overflow-fallback lane in specs (the gate
    * SFs always take the long lane, so lane equality needs its own pin). */
  private[operators] def zorderLayoutImpl(spark: SparkSession, dir: String,
                                          forceDecimal: Boolean): DataFrame = {
    implicit val s: SparkSession = spark
    // ONE bounded collect (a single max/max row — the graph_hits
    // 1-row-collect precedent): with the maxima in hand as literals, the
    // per-row range scaling runs in the plain LONG lane whenever
    // max·65536 provably cannot overflow int64 (r13: the DECIMAL(38)
    // multiply-divide ×3 per row was the sf1 cost center — 29.4 s → the
    // scan-bound floor; DuckDB's HUGEINT lane lands the same values, so
    // the oracle is unchanged). Keys past 2^47 fall back to the exact
    // DECIMAL lane, same expressions as before.
    val mrow = Tables(dir).lineitem.agg(
      max(col("l_orderkey")).as("max_o"), max(col("l_partkey")).as("max_p")).head()
    // empty table → null maxes; 0 keeps the (empty) plan analyzable so the
    // query degrades to zero output rows like the pre-r13 form did
    val maxO = if (mrow.isNullAt(0)) 0L else mrow.getLong(0)
    val maxP = if (mrow.isNullAt(1)) 0L else mrow.getLong(1)
    val longSafe = !forceDecimal &&
      maxO < (Long.MaxValue / 65536) - 1 && maxP < (Long.MaxValue / 65536) - 1
    def scaled(c: String, mx: Long, f: Long): String =
      if (longSafe) s"$c * ${f}L div ${mx + 1}L"
      else s"CAST(CAST($c AS DECIMAL(38,0)) * $f div ${mx + 1} AS BIGINT)"
    val xy = Tables(dir).lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .withColumn("x", expr(scaled("l_orderkey", maxO, 65536L)))
      .withColumn("y", expr(scaled("l_partkey", maxP, 65536L)))
      .withColumn("z", expr(s"${zSpread("x", sparkShl)} | ${sparkShl(zSpread("y", sparkShl), 1)}"))
      .withColumn("lin_file", expr(scaled("l_orderkey", maxO, ZFiles.toLong)))
      .withColumn("z_file", expr(s"z div $ZCellWidth"))
      .withColumn("lo", lit(maxP * PredLoPct / 100))
      .withColumn("hi", lit(maxP * PredHiPct / 100))
    // r13: pre-aggregate on the COMPOSITE (lin_file, z_file) cell before
    // any explode — ≤ ZFiles² groups, map-side combined over the scan, so
    // the fact table is never doubled through the shuffle (the old plan
    // exploded 2 structs per row and aggregated 2|T| rows; this one
    // aggregates |T| rows once, then replays the ≤65k cells). min/max/sum
    // are merge-exact over whole cells, so per-file stats are identical.
    val cells = xy
      .groupBy(col("lin_file"), col("z_file"))
      .agg(
        count(lit(1)).as("cn"),
        min(col("l_partkey")).as("cmin"),
        max(col("l_partkey")).as("cmax"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
    val perFile = cells
      .select(col("cn"), col("cmin"), col("cmax"), col("lo"), col("hi"),
        explode(array(
          struct(lit("linear").as("layout"), col("lin_file").as("file")),
          struct(lit("zorder").as("layout"), col("z_file").as("file")))).as("a"))
      .groupBy(col("a.layout").as("layout"), col("a.file").as("file"))
      .agg(
        sum(col("cn")).as("n_rows"),
        min(col("cmin")).as("min_p"),
        max(col("cmax")).as("max_p"),
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

  // ------------------------------------------------- table statistics

  /** The fact-table columns the stats pass covers: integer keys and
    * low-cardinality flags — the dtypes whose canonical string rendering
    * is identical in every engine (doubles/timestamps are profiled by
    * `csr_column_profile` instead, where rendering stays engine-local). */
  private val StatsCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_returnflag", "l_linestatus")

  /** r14 (verdict #2) — the storage-governance family's SHARED staged
    * frame: the fact table's (col_name, val, cnt) value-multiplicity
    * cells over [[StatsCols]], content-gated on lineitem.parquet (the
    * [[graft.operators.DedupQueries]] stagedSourceShingles precedent).
    * `storage_table_stats`, `q_join_skew_audit`, and
    * `storage_join_advisor` each re-melted and re-aggregated the fact
    * table per run — the largest unshared heavy front left at sf1
    * (16.8 + 12.9 + 12.0 s). Every one of their measures is a fold over
    * these cells (row/null/width sums weighted by cnt, NDV a count,
    * skew's count-of-counts a (col, cnt) groupBy, the advisor's
    * max-key-rows a max) — so the corpus-linear melt lands ONCE per
    * fact-table state and the three reads work ∝ |distinct (col, val)|,
    * never |rows|·6. At 100 TB this is the ANALYZE discipline: cells are
    * per-partition landable and merge by cnt-sum, and the governance
    * dashboards consult the landed frame. */
  /** One melt pass of a lineitem-shaped frame to (col_name, val, cnt)
    * cells (explode_outer: the literal array is never empty, and the
    * outer form plants no generator filter for pushdown to re-derive). */
  private def meltCells(li: DataFrame): DataFrame =
    li.select(explode_outer(array(StatsCols.map(c =>
        struct(lit(c).as("k"), col(c).cast("string").as("v"))): _*)).as("a"))
      .select(col("a.k").as("col_name"), col("a.v").as("val"))
      .groupBy("col_name", "val").agg(count(lit(1)).as("cnt"))

  private[operators] def stagedValCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val path = s"/tmp/graft_vcnt_${new java.io.File(dir).getName}"
    Stage.ensure(path, s"$dir/lineitem.parquet") {
      meltCells(Tables(dir).lineitem).write.mode("overwrite").parquet(path)
    }
    Cached.track(graft.sources.Tables.relationAt(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** The o_custkey leg of the skew/advisor melt, staged against the
    * orders table (same (col_name, val, cnt) schema as
    * [[stagedValCounts]] so the consumers union the two frames). */
  private[operators] def stagedCustKeyCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val path = s"/tmp/graft_ocust_${new java.io.File(dir).getName}"
    Stage.ensure(path, s"$dir/orders.parquet") {
      Tables(dir).orders
        .select(lit("o_custkey").as("col_name"), col("o_custkey").cast("string").as("val"))
        .groupBy("col_name", "val").agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(path)
    }
    Cached.track(graft.sources.Tables.relationAt(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** §8p(cu) — ANALYZE-style table statistics: per column, the numbers a
    * cost-based optimizer actually consumes — row count, null count and
    * null fraction (ppm), average rendered width (per-mille chars), and
    * the distinct count both ways: the HLL register estimate
    * ([[graft.pipeline.HllTable]] — the mergeable, landable sketch a
    * 100 TB ANALYZE would persist per partition and fold) with the exact
    * NDV riding along as the in-data accuracy audit.
    *
    * One scan melts the six columns to (col_name, val) rows; everything
    * downstream is keyed aggregates with map-side partials. The sketch
    * and the exact NDV both read one persisted (col, val) DISTINCT
    * frame — register max is duplicate-idempotent, so hashing the value
    * SET costs md5 over |values| instead of |rows|·6, and the exact NDV
    * falls out as a plain count. At the full table a production pass
    * lands per-FILE register tables and merges (register max is
    * exact-associative); exact_ndv is the only column that wouldn't
    * survive that cheaply — it is the audit, not the product. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    // r14: the (col, val, multiplicity) frame comes STAGED — every stat
    // is a fold over it (row/null/width sums weighted by multiplicity,
    // exact NDV a plain count), and the sketch hashes the value SET
    // (register max is duplicate-idempotent), so md5 runs over |values|,
    // not |rows|·6, and the corpus-linear melt is paid once per
    // fact-table state, not per run.
    tableStatsFrom(spark, stagedValCounts(spark, dir))
  }

  /** The ANALYZE tail over any (col_name, val, cnt) cell frame — shared
    * by the batch query and the incremental twin, so both consume the
    * IDENTICAL fold/sketch chain. */
  private def tableStatsFrom(spark: SparkSession, valCounts: DataFrame): DataFrame = {
    implicit val s: SparkSession = spark
    val stats = valCounts.groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
      sum(length(col("val")) * col("cnt")).as("width_sum"),
      count(col("val")).as("exact_ndv"))
    val est = graft.pipeline.HllTable.estimate(
      graft.pipeline.HllTable.build(valCounts.where(col("val").isNotNull),
        col("val"), col("col_name")))
      .select(col("grain").as("col_name"), col("est").as("ndv_est"))
    stats.join(est, Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        expr("n_nulls * 1000000 div n_rows").as("null_ppm"),
        expr("width_sum * 1000 div greatest(n_rows - n_nulls, 1)").as("avg_width_pm"),
        col("exact_ndv"), col("ndv_est"))
  }

  private def tableStatsSql = {
    import graft.pipeline.HllTable.{regSql, rhoSql, EstNumerator, M}
    val melt = StatsCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH melted AS (
       |  $melt),
       |stats AS (
       |  SELECT col_name, COUNT(*) AS n_rows,
       |    CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |    CAST(SUM(LENGTH(val)) AS BIGINT) AS width_sum,
       |    COUNT(DISTINCT val) AS exact_ndv
       |  FROM melted GROUP BY 1),
       |h AS (SELECT col_name, ${regSql("val")} AS reg, ${rhoSql("val")} AS rho
       |      FROM melted WHERE val IS NOT NULL),
       |regs AS (SELECT col_name, reg, MAX(rho) AS max_rho FROM h GROUP BY 1, 2),
       |agg AS (SELECT col_name, COUNT(*) AS n_regs_hit,
       |          CAST(SUM(CAST(1 AS BIGINT) << (53 - max_rho)) AS BIGINT) AS hit_num
       |        FROM regs GROUP BY 1),
       |est AS (SELECT col_name, CAST($M - n_regs_hit AS BIGINT) AS zero_regs,
       |          hit_num + ($M - n_regs_hit) * (CAST(1 AS BIGINT) << 53) AS harmonic_num
       |        FROM agg)
       |SELECT s.col_name, n_rows, n_nulls,
       |  n_nulls * 1000000 // n_rows AS null_ppm,
       |  width_sum * 1000 // GREATEST(n_rows - n_nulls, 1) AS avg_width_pm,
       |  exact_ndv,
       |  ROUND(CASE WHEN zero_regs > 0
       |          AND $EstNumerator / CAST(harmonic_num AS DOUBLE) <= ${2.5 * M}
       |        THEN $M * ln($M / CAST(zero_regs AS DOUBLE))
       |        ELSE $EstNumerator / CAST(harmonic_num AS DOUBLE) END, 4) AS ndv_est
       |FROM stats s JOIN est USING (col_name)
       |ORDER BY col_name""".stripMargin
  }

  // ------------------------------------- incremental table statistics

  /** The ARCHIVE split's cells (md5 orderkey-bucket < 80, the
    * `incrementalDedup` split convention at order grain — a whole order
    * lands at once), staged once per fact-table state. */
  private def stagedArchiveValCounts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val path = s"/tmp/graft_vcnt80_${new java.io.File(dir).getName}"
    Stage.ensure(path, s"$dir/lineitem.parquet") {
      meltCells(Tables(dir).lineitem.where(
        graft.plans.VectorExpressions.hexPrefix(md5(col("l_orderkey").cast("string")), 8) % 100 < 80))
        .write.mode("overwrite").parquet(path)
    }
    Cached.track(graft.sources.Tables.relationAt(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** §8aa(et) r14 — INCREMENTAL table statistics: the full-table ANALYZE
    * result computed by melting only the NEW batch (orderkey-bucket
    * ≥ 80) and merging its cells into the staged archive cells by
    * cnt-SUM — the claim [[stagedValCounts]] makes for a 100 TB ANALYZE
    * ("cells are per-partition landable and merge by cnt-sum"),
    * registered and oracled: the archive is never re-melted, untouched
    * cells pass through the merge, and the shared [[tableStatsFrom]]
    * tail (folds + HLL sketch — register max is duplicate-idempotent,
    * so merged cells feed it unchanged) lands exactly the batch
    * `storage_table_stats` rows. Oracle = the full-table stats SQL. */
  def tableStatsIncremental(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    // r14 (opt): Tables.spread on the per-run batch melt A/B-measured
    // 2.24 -> 2.60 s — the melt collapses map-side into the (col,val)
    // partial agg, so the round-robin exchange of the raw rows costs more
    // than the parallelized md5+explode saves; REJECTED
    val batchCells = meltCells(Tables(dir).lineitem.where(
      graft.plans.VectorExpressions.hexPrefix(md5(col("l_orderkey").cast("string")), 8) % 100 >= 80))
    val merged = stagedArchiveValCounts(spark, dir)
      .unionByName(batchCells)
      .groupBy("col_name", "val").agg(sum(col("cnt")).as("cnt"))
    tableStatsFrom(spark, merged)
  }

  val queries: Map[String, Q] = Map(
    "zone_map_stats" -> Q(zoneMapStats _, zoneMapStatsSql, Seq(col("column"))),
    "csr_column_profile" -> Q(columnProfile _, columnProfileSql, Seq(col("column"))),
    "storage_compaction_plan" -> Q(compactionPlan _, compactionPlanSql,
      Seq(col("source"), col("shard"))),
    "storage_zorder_layout" -> Q(zorderLayout _, zorderLayoutSql, Seq(col("layout"))),
    "storage_table_stats" -> Q(tableStats _, tableStatsSql, Seq(col("col_name"))),
    "storage_stats_incremental" -> Q(tableStatsIncremental _, tableStatsSql,
      Seq(col("col_name"))),
  )
}
