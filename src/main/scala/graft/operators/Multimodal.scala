package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed media record: opaque payload + queryable metadata. */
final case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    fmt: String,
    width: Int,
    height: Int)

/** Stubbed decode output (the container ships no codec libraries). */
final case class MediaFeatures(
    doc_id: Long,
    fmt: String,
    n_bytes: Long,
    // STUB — a real deployment would decode pixels here; this container has
    // no image/audio codecs, so the "feature" is a deterministic byte stat.
    byte_mean: Double,
    head_hex: String)

/** Batch-iterator decode plumbing (SURVEY §2.3 row 35).
  *
  * The Scala analogue of a `mapInPandas` decode stage: `mapPartitions`
  * hands each task an iterator of typed records so a real decoder could
  * amortize per-batch setup (codec contexts, GPU handles) across the
  * partition — the batch shape, schema, and partitioning are the real
  * thing; only the codec call is stubbed deterministically.
  */
object Multimodal {

  private val HexChars = "0123456789ABCDEF"

  /** Deterministic stand-in for the codec call. */
  private[operators] def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length
    val mean =
      if (n == 0) 0.0
      else r.payload.iterator.map(b => (b & 0xff).toDouble).sum / n
    val head = r.payload.iterator.take(8).flatMap { b =>
      Iterator(HexChars((b & 0xf0) >> 4), HexChars(b & 0x0f))
    }.mkString
    MediaFeatures(r.doc_id, r.fmt, n.toLong, mean, head)
  }

  /** Partition-batched decode: one iterator per task, no per-row setup. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup (codec context) would be opened here once
      batch.map(decodeStub)
    }
  }

  /** documents → typed media records (text bytes stand in for media). */
  def fromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("fmt"),
      (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 5) * 48).cast("int").as("height"))
      .as[MediaRecord]
  }
}
