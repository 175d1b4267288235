package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyed snapshot diff: added / removed / changed detection.
  *
  * The reference's incremental sync (scripts/sync.py:126-150,
  * `FilesModifications.add_files/remove_files`) diffs (file, sha1) pairs
  * between the drop zone and the staged input dir and only propagates
  * deltas. Generalized here to datasets: two snapshots keyed by a primary
  * key, with a content signature (md5 over a stable string encoding) per
  * row — exactly the done-signal idiom of main.py:66 but distributed.
  *
  * Spark-first shape: signatures are computed map-side; the diff is one
  * full-outer join co-partitioned on the key. At 100 TB both snapshots
  * shuffle once on the key (or zero times if both are bucketed on it).
  */
object SnapshotDiff {

  /** Stable cross-engine row signature: doubles are decimal(18,2)-quantized
    * before stringification so the same value always renders identically. */
  def signature(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column = {
    val parts = cols.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType =>
          col(c).cast(DecimalType(18, 2)).cast("string")
        case _ => col(c).cast("string")
      }
    }
    md5(concat_ws("|", parts: _*))
  }

  /** @return (key, status ∈ {added, removed, changed}, old_sig, new_sig) —
    *         unchanged rows are dropped. */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String, sigCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(key), signature(oldDf, sigCols).as("old_sig"))
    val n = newDf.select(col(key), signature(newDf, sigCols).as("new_sig"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("old_sig").isNull, "added")
          .when(col("new_sig").isNull, "removed")
          .when(col("old_sig") =!= col("new_sig"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col(key), col("status"), col("old_sig"), col("new_sig"))
  }
}
