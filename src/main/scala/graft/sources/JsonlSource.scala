package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Config-driven JSONL (one JSON object per line) ingestion — the lingua
  * franca of LLM training corpora, added alongside the reference's
  * delimited formats ([[DelimitedSource]]).
  *
  * Same discipline as the delimited reader: the schema is EXPLICIT, never
  * inferred — schema inference on a 100 TB drop zone is a full extra pass
  * and a schema drift hazard (one new field in one shard silently changes
  * every reader). JSONL is line-splittable, so the scan parallelizes like
  * CSV; fields absent from a line are NULL, fields not in the schema are
  * ignored.
  */
object JsonlSource {

  /** Strict read: malformed lines become all-NULL rows tagged in
    * `_corrupt` (Spark PERMISSIVE mode with an explicit corrupt-record
    * column — the raw line is PRESERVED, mirroring
    * [[DelimitedSource.readTagged]]'s replay discipline). */
  def readTagged(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame = {
    require(paths.nonEmpty, "JsonlSource.readTagged: empty path list")
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(paths: _*)
  }

  /** Rows that parsed cleanly, bookkeeping dropped. */
  def good(tagged: DataFrame): DataFrame =
    tagged.where(col("_corrupt").isNull).drop("_corrupt")

  /** Malformed lines, as their original raw text. */
  def quarantined(tagged: DataFrame): DataFrame =
    tagged.where(col("_corrupt").isNotNull).select(col("_corrupt").as("raw_line"))

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    good(readTagged(spark, Seq(path), schema))
}
