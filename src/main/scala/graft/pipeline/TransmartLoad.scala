package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Load-stage surface: staged TSV export + checksum manifest.
  *
  * The reference's final stage hands csr2transmart's tables to
  * transmart-copy as TSV staging files and keeps every intermediate
  * checksummed/versioned (luigi-pipeline/main.py:120-147 load step;
  * scripts/checksum.py sha1 companions; git_commons.py lineage commits).
  * The Spark-native equivalent: each table is written as delimited text by
  * the cluster (splittable, parallel), and the lineage record is a
  * manifest DataFrame of (file, sha1, n_bytes) computed distributively —
  * the same signature content a [[Dag]] task publishes as its done-signal.
  */
object TransmartLoad {

  /** Write `df` as headered TSV under `dir/name/` (parallel part files —
    * a 100 TB table writes from every executor; transmart-copy-style
    * single-file staging is a `coalesce(1)` the caller opts into). */
  def writeStaging(df: DataFrame, dir: String, name: String,
                   singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("delimiter", "\t").option("header", "true")
      .option("emptyValue", "")
      .csv(s"$dir/$name")
  }

  /** Distributed manifest of a staged directory: (rel_path, sha1, n_bytes).
    * Sorted rendering of this frame == the Dag done-signal content
    * (main.py:66 calc_done_signal_content is the same `file checksum`
    * list, computed single-node). */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .where(!col("path").endsWith("_SUCCESS"))
      .select(
        // reluctant anchored strip: first occurrence of the root prefix
        // (greedy would mis-key when the root string repeats in a path)
        regexp_replace(col("path"), s"^.*?${java.util.regex.Pattern.quote(dir.stripSuffix("/"))}/", "").as("rel_path"),
        sha1(col("content")).as("sha1"),
        length(col("content")).cast("long").as("n_bytes"))

  /** Done-signal content for a staged dir (driver-side render of the
    * distributed manifest — bounded: one line per file). */
  def doneSignal(spark: SparkSession, dir: String): String =
    manifest(spark, dir)
      .orderBy("rel_path")
      .collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}")
      .mkString("\n")
}
