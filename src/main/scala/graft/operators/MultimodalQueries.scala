package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3 row 35).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * riding alongside — the schema/partitioning pattern a 100 TB image/audio
  * corpus uses (payload stays columnar and prunable; metadata is queryable
  * without touching the bytes). The container has no codec libraries, so
  * "decode" is a clearly-marked deterministic stub over the bytes
  * (see [[Multimodal]] for the typed batch-iterator plumbing); everything
  * Spark-side — binary construction, struct metadata, pruning, batch
  * shape — is real.
  */
object MultimodalQueries {

  /** Binary payload + metadata struct + stubbed decode features, flattened
    * to scalars for the oracle. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Tables(dir).documents
      // payload: the doc text bytes stand in for an undecodable media blob
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("fmt"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 48).cast("int").as("height"),
        ((col("n_chars") % 30) + 1).cast("int").as("n_frames")))
      .select(
        col("doc_id"),
        col("meta.fmt").as("fmt"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        // stubbed "thumbnail": first 16 payload bytes, hex
        substring(hex(col("payload")), 1, 32).as("thumb_hex"))
  }

  private val binaryMetaSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS fmt,
      |  CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
      |  CAST(64 + (doc_id % 5) * 48 AS INT) AS height,
      |  CAST((n_chars % 30) + 1 AS INT) AS n_frames,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  substring(hex(encode(text)), 1, 32) AS thumb_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_binary_meta" -> Q(binaryMeta _, binaryMetaSql, Seq(col("doc_id"))),
  )
}
