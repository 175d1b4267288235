package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed drop-zone sync (SURVEY §2.2 rows 17+22, file level).
  *
  * The reference's scripts/sync.py pairs every data file with a `.sha1`
  * companion, verifies the declared checksum against the recomputed one
  * (scripts/checksum.py:13 `compute_sha1`), and diffs two directory trees
  * into added/removed/changed sets (`sync.py:142 sync_dirs`,
  * `:113 get_checksum_pairs_set`).
  *
  * Spark-first shape: `binaryFile` reads are distributed and splittable
  * across files — a 100 TB drop zone with millions of files hashes in
  * parallel across the cluster; the diff itself is [[SnapshotDiff]]'s
  * co-partitioned full-outer join keyed on the relative path.
  */
object FileSync {

  /** (rel_path, sha1) recomputed from file contents (excludes `.sha1`
    * companions and hidden dotfiles, like the reference's
    * `sync.is_hidden_file` skip). */
  def actualChecksums(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .where(!col("path").endsWith(".sha1") &&
        !element_at(split(col("path"), "/"), -1).startsWith("."))
      .select(relPath(root), sha1(col("content")).as("sha1"))

  /** (rel_path, sha1) as declared by the `.sha1` companion files
    * (first whitespace-separated token, like `sha1sum` output). */
  def declaredChecksums(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.sha1")
      .load(root)
      .select(
        regexp_replace(relPath(root), "\\.sha1$", "").as("rel_path"),
        split(trim(col("content").cast("string")), "\\s+").getItem(0).as("sha1"))

  /** Strips everything up to the FIRST occurrence of the root prefix
    * (reluctant `^.*?` — a greedy `.*` would match up to the LAST
    * occurrence and mis-key the diff if the root string repeats inside a
    * file's absolute path, e.g. root `/data/x`, file `/data/x/data/x/y`). */
  private def relPath(root: String) =
    regexp_replace(col("path"), s"^.*?${java.util.regex.Pattern.quote(root.stripSuffix("/"))}/", "")
      .as("rel_path")

  /** Files whose recomputed checksum disagrees with the declared one, or
    * with a missing/orphaned companion (the reference aborts the sync on
    * any of these). */
  def verifyChecksums(spark: SparkSession, root: String): DataFrame = {
    val actual = actualChecksums(spark, root).withColumnRenamed("sha1", "actual_sha1")
    val declared = declaredChecksums(spark, root).withColumnRenamed("sha1", "declared_sha1")
    actual.join(declared, Seq("rel_path"), "full_outer")
      .withColumn("status",
        when(col("actual_sha1").isNull, "companion_without_file")
          .when(col("declared_sha1").isNull, "missing_companion")
          .when(col("actual_sha1") =!= col("declared_sha1"), "checksum_mismatch")
          .otherwise("ok"))
      .where(col("status") =!= "ok")
      .select("rel_path", "status", "declared_sha1", "actual_sha1")
  }

  /** Directory diff on recomputed content hashes: added / removed /
    * changed relative to `srcRoot` → `dstRoot` (what a sync would copy). */
  def diffDirs(spark: SparkSession, srcRoot: String, dstRoot: String): DataFrame = {
    val src = actualChecksums(spark, srcRoot)
    val dst = actualChecksums(spark, dstRoot)
    // SnapshotDiff semantics: dst is "old", src is "new" — "added" means
    // present in src but not yet in dst
    SnapshotDiff.diff(dst, src, "rel_path", Seq("sha1"))
  }

  /** Apply the diff (reference: `sync.sync_dirs` copies added/changed and
    * removes deleted files). Hashing/diffing is distributed; the apply
    * loop is driver-side over the DELTA only — bounded by what actually
    * changed, exactly like the reference's copy loop — and goes through
    * the Hadoop FileSystem API so any cluster store works.
    * @return the applied delta (rel_path, status). */
  def syncDirs(spark: SparkSession, srcRoot: String, dstRoot: String): Seq[(String, String)] = {
    import org.apache.hadoop.fs.Path
    val delta = diffDirs(spark, srcRoot, dstRoot)
      .select("rel_path", "status").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dstRoot).getFileSystem(conf)
    delta.foreach {
      case (rel, "removed") =>
        fs.delete(new Path(s"$dstRoot/$rel"), false)
      case (rel, _) => // added | changed
        val to = new Path(s"$dstRoot/$rel")
        fs.mkdirs(to.getParent)
        org.apache.hadoop.fs.FileUtil.copy(
          new Path(s"$srcRoot/$rel").getFileSystem(conf), new Path(s"$srcRoot/$rel"),
          fs, to, false, true, conf)
    }
    delta.toSeq
  }
}
