package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** One column of a delimited source: target name, type, and (for dates)
  * the explicit source format — mirroring the reference's per-column
  * `date_format` in sources_config.json. */
final case class ColSpec(
    name: String,
    dtype: String, // "string" | "long" | "double" | "date"
    dateFormat: Option[String] = None)

/** Config for one delimited file, mirroring the reference's per-file
  * `file_format`/`delimiter`/`date_format` sections of
  * sources_config.json (consumed there by sources2csr). */
final case class DelimitedConfig(
    delimiter: String,
    header: Boolean,
    columns: Seq[ColSpec],
    nullValue: String = "")

/** Config-driven delimited ingestion (SURVEY §4: DelimitedSource).
  *
  * Reads everything as string first (so a malformed cell can never poison
  * type inference), then applies the per-column spec: explicit casts and
  * explicit `to_date` formats — never inference, exactly like the
  * reference's config-driven reader. CSV is splittable, so the read
  * parallelizes across a 100 TB drop zone; casts are codegen'd column ops.
  */
object DelimitedSource {

  def read(spark: SparkSession, path: String, cfg: DelimitedConfig): DataFrame =
    read(spark, Seq(path), cfg)

  /** Multi-path variant — the zone-map-pruned scan hands in the surviving
    * file list instead of the directory. */
  def read(spark: SparkSession, paths: Seq[String], cfg: DelimitedConfig): DataFrame = {
    require(paths.nonEmpty, "DelimitedSource.read: empty path list")
    cfg.columns.foreach(c => require(c.dtype != "date" || c.dateFormat.isDefined,
      s"column ${c.name}: date requires dateFormat"))
    val raw = spark.read
      .option("delimiter", cfg.delimiter)
      .option("header", cfg.header.toString)
      .option("nullValue", cfg.nullValue)
      .schema(StructType(cfg.columns.map(c => StructField(c.name, StringType, nullable = true))))
      .csv(paths: _*)
    raw.select(cfg.columns.map(typed): _*)
  }

  private def typed(c: ColSpec): Column = c.dtype match {
    case "string" => col(c.name)
    case "date" =>
      val fmt = c.dateFormat.getOrElse(
        throw new IllegalArgumentException(s"column ${c.name}: date requires dateFormat"))
      to_date(col(c.name), fmt).as(c.name)
    case other => col(c.name).cast(other).as(c.name)
  }
}
