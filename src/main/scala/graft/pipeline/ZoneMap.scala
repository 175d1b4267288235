package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file column statistics over a staged directory (SURVEY §8
  * candidate (e)): the file-level analogue of parquet row-group zone
  * maps, kept as a queryable manifest.
  *
  * A 100 TB staging area is re-read incrementally; before scheduling a
  * scan, the loader consults the zone map and drops every file whose
  * [min, max] interval cannot satisfy the predicate — the same pruning
  * parquet does per row group, lifted to whole files so the scheduler
  * never even lists them. Building the map is one distributed pass
  * (`input_file_name()` groupBy → min/max/count partial aggs); consulting
  * it is a driver-side filter over a bounded frame (one row per
  * file × column).
  *
  * Values are carried as strings with a type tag — min/max comparisons
  * for pruning happen after casting back to the tagged type, so one
  * manifest schema covers every column type.
  */
object ZoneMap {

  /** (file, column, dtype, min_value, max_value, n_rows, n_nulls) for the
    * given columns of every file backing `df`. */
  def build(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perFile = df
      .withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))): _*)
    val dtypes = df.select(cols.map(col): _*).schema.map(f => f.name -> f.dataType.sql).toMap
    val entries = cols.map { c =>
      struct(lit(c).as("column"), lit(dtypes(c)).as("dtype"),
        col(s"min_$c").as("min_value"), col(s"max_$c").as("max_value"),
        col(s"nulls_$c").as("n_nulls"))
    }
    perFile
      .select(col("_file").as("file"), col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("file"), col("e.column").as("column"), col("e.dtype").as("dtype"),
        col("e.min_value").as("min_value"), col("e.max_value").as("max_value"),
        col("n_rows"), col("e.n_nulls").as("n_nulls"))
  }

  /** Zone-map-driven scan (SURVEY §8b candidate (i)): build the read over
    * ONLY the files whose [min, max] can satisfy `column ∈ [lo, hi]`, then
    * re-apply the predicate as the residual filter (pruning is
    * file-granular; rows inside a kept file still need the exact test —
    * which Spark pushes down to the parquet row groups, so the same
    * min/max idea prunes again one level down). A predicate matching
    * nothing reads nothing: the plan collapses to an empty relation. */
  def prunedParquet(spark: SparkSession, dir: String, zoneMap: DataFrame,
                    column: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(zoneMap, column, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(column) >= lo && col(column) <= hi)
  }

  /** Zone-map-driven config-ingest scan (SURVEY §8b candidate (i)): the
    * delimited drop zone gets the same scheduler-side file pruning as the
    * parquet path. The manifest is built once over the typed config-driven
    * read ([[graft.sources.DelimitedSource]] + [[build]]) and consulted
    * before every scan — CSV has no row-group statistics of its own, so
    * at 100 TB this is the ONLY pruning layer the drop zone gets, and the
    * predicate re-applies as the residual row filter inside surviving
    * files. */
  def prunedDelimited(spark: SparkSession, dir: String,
                      cfg: graft.sources.DelimitedConfig, zoneMap: DataFrame,
                      column: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(zoneMap, column, lo, hi)
    val base =
      if (files.isEmpty) graft.sources.DelimitedSource.read(spark, dir, cfg).where(lit(false))
      else graft.sources.DelimitedSource.read(spark, files, cfg)
    base.where(col(column) >= lo && col(column) <= hi)
  }

  /** Incremental maintenance (SURVEY §8b candidate (c)): attach to a file
    * stream over the staged directory and upsert each micro-batch's
    * per-file stats into the manifest — the zone map stays current as
    * files land, without ever rescanning the backlog. Each batch:
    * stats of the batch's files (one distributed pass over just those
    * files), anti-join the old manifest on file, union, write to a
    * versioned temp dir and atomically swap via the Hadoop FileSystem API
    * (readers only ever see a complete manifest). Use with
    * `Trigger.AvailableNow` for catch-up or a continuous trigger for
    * steady-state ingest; exactly-once comes from the stream checkpoint —
    * re-processed files upsert idempotently (same file key, same stats).
    *
    * Returns the DataStreamWriter so the caller owns trigger/checkpoint. */
  def maintain(stream: DataFrame, cols: Seq[String], manifestDir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val stats = build(batch, cols)
      val conf = spark.sparkContext.hadoopConfiguration
      val target = new org.apache.hadoop.fs.Path(manifestDir)
      val fs = target.getFileSystem(conf)
      // crash recovery: a failure between the two swap renames below
      // leaves the previous manifest under .old-<batch>; restore the
      // newest backup BEFORE merging, so a retried batch can never
      // truncate the manifest down to its own files
      if (!fs.exists(target) && fs.exists(target.getParent)) {
        val prefix = target.getName + ".old-"
        val backups = fs.listStatus(target.getParent).map(_.getPath)
          .filter(_.getName.startsWith(prefix))
        if (backups.nonEmpty) {
          val newest = backups.maxBy(_.getName.stripPrefix(prefix).toLong)
          if (!fs.rename(newest, target)) // an ignored failure here would
            throw new java.io.IOException( // truncate history to this batch
              s"zone-map manifest restore failed: $newest -> $target")
        }
      }
      val merged =
        if (fs.exists(target)) {
          val batchFiles = stats.select("file").distinct()
          val old = spark.read.parquet(manifestDir)
          old.join(batchFiles, Seq("file"), "left_anti").unionByName(stats)
        } else stats
      val tmp = new org.apache.hadoop.fs.Path(s"$manifestDir.tmp-$batchId")
      val old = new org.apache.hadoop.fs.Path(s"$manifestDir.old-$batchId")
      merged.write.mode("overwrite").parquet(tmp.toString)
      // two renames, not delete-then-rename: a crash mid-swap leaves the
      // previous manifest recoverable under .old-<batch> instead of gone.
      // A leftover .old-<batch> from a prior attempt of this SAME batch is
      // redundant once target exists (the swap completed before the crash)
      // and must go first — renaming onto an existing dir would NEST
      // target inside it and poison any later restore.
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(target) && !fs.rename(target, old))
        throw new java.io.IOException(s"zone-map manifest swap failed: $target -> $old")
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"zone-map manifest swap failed: $tmp -> $target")
      fs.delete(old, true)
      ()
    }
  }

  /** Files that MIGHT contain rows with `column` in [lo, hi] — interval
    * overlap on the zone map, casting min/max back to the column's type.
    * No false negatives: a file is only dropped when its whole range lies
    * outside the predicate. Files where the column is entirely null are
    * dropped (no value can match a range predicate). */
  def candidateFiles(zoneMap: DataFrame, column: String, lo: Column, hi: Column): Seq[String] = {
    import zoneMap.sparkSession.implicits._
    val forCol = zoneMap.where(col("column") === column)
    // One dtype per column (all files share the table schema); the manifest
    // is bounded (files × columns), so a driver-side read is the point —
    // this runs in the scheduler before any scan is launched.
    forCol.select("dtype").distinct().as[String].collect().toSeq match {
      case Seq(dtype) =>
        forCol
          .where(col("min_value").isNotNull && col("max_value").isNotNull)
          .where(col("max_value").cast(dtype) >= lo && col("min_value").cast(dtype) <= hi)
          .select("file").orderBy("file").as[String].collect().toSeq
      case Seq() => Seq.empty
      case dts => throw new IllegalArgumentException(
        s"zone map has conflicting dtypes for column $column: ${dts.mkString(", ")}")
    }
  }
}
