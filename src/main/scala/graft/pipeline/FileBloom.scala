package graft.pipeline

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom manifest: the POINT-predicate complement to
  * [[ZoneMap]]'s range pruning. A [min, max] interval prunes nothing for
  * a high-cardinality key scattered uniformly across files (every file's
  * range covers every probe); a per-file Bloom filter answers "could
  * this file contain key K?" with no false negatives and a bounded
  * false-positive rate, so the scheduler skips files before listing a
  * single row group — the same file-skipping discipline Delta/Iceberg
  * get from their puppet Bloom indexes, built here as a plain queryable
  * manifest.
  *
  * The filter is stored as the SORTED ARRAY of set bit positions rather
  * than a packed bitmap: bounded by `numBits` entries per (file, column),
  * mergeable by array union, and directly consultable from SQL
  * (`array_contains`) with no binary decoding. Cell positions come from
  * the double-hashing scheme pos_i = (h1 + i·h2) mod m over the md5 of
  * the value — deterministic across engines and runs.
  */
object FileBloom {

  /** `numBits` cells per (file, column); `k` probes per value. Defaults
    * give ~1% false positives at ~400 distinct values per file. */
  final case class Config(numBits: Int = 4096, k: Int = 3)

  private def positions(value: Column, cfg: Config): Column = {
    val h1 = VectorExpressions.hexPrefix(md5(value.cast("string")), 8)
    val h2 = VectorExpressions.hexPrefix(md5(concat(value.cast("string"), lit("#2"))), 8) % (cfg.numBits - 1) + 1
    array((0 until cfg.k).map(i => ((h1 + lit(i.toLong) * h2) % cfg.numBits).cast("int")): _*)
  }

  /** One manifest row per file: the sorted distinct cell positions set by
    * the file's values of `column`. One distributed pass: distinct
    * (file, value) collapses duplicates BEFORE cells explode, so the
    * aggregate carries at most |distinct values| × k cells per file. */
  def build(df: DataFrame, column: String, cfg: Config = Config()): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.withColumn("_file", input_file_name())
      .select(col("_file"), col(column).as("_v")).where(col("_v").isNotNull).distinct()
      .select(col("_file"), explode(positions(col("_v"), cfg)).as("pos"))
      .groupBy(col("_file"))
      .agg(sort_array(collect_set(col("pos"))).as("cells"))
      .select(col("_file").as("file"), lit(column).as("column"), col("cells"))
  }

  /** Files that COULD contain `value`: all k probe cells present. The
    * manifest is bounded (files × ≤numBits ints) — this is scheduler
    * work, like [[ZoneMap.candidateFiles]]. No false negatives: a value
    * present in a file set all k of its cells when the manifest was
    * built. */
  def candidateFiles(bloom: DataFrame, column: String, value: Column,
                     cfg: Config = Config()): Seq[String] = {
    import bloom.sparkSession.implicits._
    bloom.where(col("column") === column)
      .where((0 until cfg.k).map(i =>
        array_contains(col("cells"), element_at(positions(value, cfg), i + 1)))
        .reduce(_ && _))
      .select("file").orderBy("file").as[String].collect().toSeq
  }

  /** Bloom-pruned point lookup: read only candidate files, re-apply the
    * exact predicate as the residual filter. */
  def prunedParquet(spark: SparkSession, dir: String, bloom: DataFrame,
                    column: String, value: Column,
                    cfg: Config = Config()): DataFrame = {
    val files = candidateFiles(bloom, column, value, cfg)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(column) === value)
  }
}
