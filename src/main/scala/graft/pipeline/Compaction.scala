package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the staging area.
  *
  * Incremental ingest (FileSync cycles, streaming sinks, per-batch
  * drops) accumulates files far below the efficient scan size; at 100 TB
  * the file-listing and per-file open overhead starts to dominate the
  * scan. Compaction is the standard maintenance pass: bin-pack the small
  * files into target-sized groups and rewrite each group as one file.
  *
  * The planning input is the zone-map manifest ([[ZoneMap.build]] — one
  * row per file × column with n_rows), NOT a re-scan: deciding what to
  * compact costs a driver-side pass over the bounded manifest, exactly
  * like [[ZoneMap.candidateFiles]] scheduling. The rewrite itself is one
  * distributed job: every group is hash-clustered to its own partition
  * (`repartition(col)` + `partitionBy`), so each group writes exactly one
  * file and no group is ever split — there is no per-group driver loop.
  *
  * Reference anchor: the reference's sync stage re-stages whole drops
  * (scripts/sync.py sync_dirs); compaction is the missing maintenance
  * half once drops are incremental.
  */
object Compaction {

  /** First-fit-decreasing bin packing of the small files.
    *
    * Files with n_rows >= targetRows are left alone (already efficient).
    * The rest are sorted by descending row count (ties broken by file
    * name for determinism) and placed into the first group with room;
    * a group is "full" at targetRows. Singleton groups are dropped —
    * rewriting one small file buys nothing until siblings arrive.
    *
    * Driver-side by design: the manifest is bounded (one row per file). */
  def plan(manifest: DataFrame, targetRows: Long): Seq[(String, Int)] = {
    require(targetRows > 0, "targetRows must be positive")
    val files = manifest.select(col("file"), col("n_rows"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 < targetRows)
      .sortBy { case (f, n) => (-n, f) }
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Long, List[String])]
    files.foreach { case (f, n) =>
      groups.indexWhere(_._1 + n <= targetRows) match {
        case -1 => groups += ((n, List(f)))
        case i => val (tot, fs) = groups(i); groups(i) = (tot + n, f :: fs)
      }
    }
    groups.iterator.zipWithIndex
      .filter(_._1._2.lengthCompare(1) > 0)
      .flatMap { case ((_, fs), g) => fs.map(_ -> g) }
      .toSeq.sortBy(_._1)
  }

  /** Range-aware compaction planning (SURVEY §8c candidate (k)): bin only
    * RANGE-ADJACENT files, so zone-map pruning stays tight after the
    * rewrite.
    *
    * [[plan]] packs purely by size — a group can merge files from opposite
    * ends of the value space, and the compacted file's [min, max] interval
    * then covers nearly the whole domain, which un-prunes every future
    * zone-map scan on `column`. Here the small files are sorted by their
    * `column` interval (typed min, then max, then name; all-null files
    * sort last) and groups are CONSECUTIVE RUNS in that order, closed when
    * the next file would overflow `targetRows`. Each output file's
    * interval is therefore the union of neighboring intervals — as tight
    * as the input layout allows — instead of an arbitrary size-driven
    * union. The trade-off vs FFD is documented: packing can leave more
    * residual slack per group (runs close early), but scan-scheduling
    * selectivity is worth far more than a few under-full files at 100 TB.
    *
    * Driver-side over the bounded manifest, like [[plan]]; the returned
    * assignment feeds [[compact]] unchanged. */
  def planByRange(manifest: DataFrame, column: String, targetRows: Long): Seq[(String, Int)] = {
    require(targetRows > 0, "targetRows must be positive")
    val rows = manifest.where(col("column") === column)
      .select(col("file"), col("dtype"), col("min_value"), col("max_value"), col("n_rows"))
      .collect()
    // typed interval sort key: numeric dtypes compare as numbers, dates /
    // timestamps / strings compare lexicographically (ISO formats order
    // correctly as strings); an all-null file has no interval → sorts last
    def key(dtype: String, v: String): (Int, Double, String) =
      if (v == null) (1, 0.0, "")
      else if (Set("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE").contains(dtype)
        || dtype.startsWith("DECIMAL")) (0, v.toDouble, "")
      else (0, 0.0, v)
    val files = rows
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .filter(_._5 < targetRows)
      .sortBy { case (f, dt, mn, mx, _) => (key(dt, mn), key(dt, mx), f) }
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Long, List[String])]
    files.foreach { case (f, _, _, _, n) =>
      groups.lastOption match {
        case Some((tot, fs)) if tot + n <= targetRows =>
          groups(groups.length - 1) = (tot + n, f :: fs)
        case _ => groups += ((n, List(f)))
      }
    }
    groups.iterator.zipWithIndex
      .filter(_._1._2.lengthCompare(1) > 0)
      .flatMap { case ((_, fs), g) => fs.map(_ -> g) }
      .toSeq.sortBy(_._1)
  }

  /** Execute a compaction plan: read only the planned files, route every
    * group to one shuffle partition, write one file per group under
    * `outDir/compaction_group=N/`. `reader` abstracts the format (parquet
    * staging vs delimited drop zone). Returns a per-group summary.
    *
    * `sortCol` (§8d(o), pair of [[planByRange]]): sort each group's rows
    * by the zone column before writing, so the output file's parquet
    * ROW-GROUP statistics stay as tight as its file-level interval —
    * range-adjacent planning keeps pruning sharp across files, the
    * within-group sort keeps it sharp inside them. A sortWithinPartitions
    * only — the group routing already clustered rows, so no extra
    * exchange is added. */
  def compact(spark: SparkSession, assignment: Seq[(String, Int)], outDir: String,
              reader: Seq[String] => DataFrame, sortCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(assignment.nonEmpty, "empty compaction plan")
    val groupOf = assignment.toMap
    val byGroup = udfFreeGroupColumn(spark, groupOf)
    val data = reader(assignment.map(_._1))
      .withColumn("_file", input_file_name())
      .join(broadcast(byGroup), Seq("_file"))
      .drop("_file")
    val routed = data.repartition(col("compaction_group"))
    sortCol.fold(routed)(c => routed.sortWithinPartitions(col("compaction_group"), col(c)))
      .write.mode("overwrite")
      .partitionBy("compaction_group")
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("compaction_group"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("compaction_group"))
  }

  /** (file → group) as a broadcastable frame; a join keeps the row path
    * codegen'd (no UDF in the hot loop). */
  private def udfFreeGroupColumn(spark: SparkSession,
      groupOf: Map[String, Int]): DataFrame = {
    import spark.implicits._
    groupOf.toSeq.toDF("_file", "compaction_group")
  }
}
