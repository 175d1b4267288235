package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Codebook (code → label) decoding.
  *
  * The reference binds tab-separated codebook files to source columns
  * (sources_config.json `codebooks` section; e.g. SEX: 1→male, 2→female,
  * 9→unknown in studies/individual_codebook.txt) and rewrites coded values
  * to labels during sources2csr.
  *
  * Spark-first shape: the codebook is a small DataFrame
  * (column_name, code, label) broadcast-joined against the fact table —
  * a map-side hash join with zero shuffle of the fact side, which is the
  * only strategy that survives a 100 TB fact table. Unmatched codes keep
  * their original value (the reference passes unknown codes through).
  */
object CodebookDecode {

  /** Decode `column` of `df` using `codebook` rows where
    * codebook.column_name == column; codebook schema:
    * (column_name: String, code: String, label: String).
    */
  def decode(df: DataFrame, column: String, codebook: DataFrame): DataFrame = {
    val cb = codebook.filter(col("column_name") === column)
      .select(col("code").as(s"__cb_code_$column"), col("label").as(s"__cb_label_$column"))
    df.join(broadcast(cb), df(column) === col(s"__cb_code_$column"), "left")
      .withColumn(column, coalesce(col(s"__cb_label_$column"), df(column)))
      .drop(s"__cb_code_$column", s"__cb_label_$column")
  }

  def decodeAll(df: DataFrame, columns: Seq[String], codebook: DataFrame): DataFrame =
    columns.foldLeft(df)((acc, c) => decode(acc, c, codebook))
}
