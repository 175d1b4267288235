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

  /** Frame sampling over the opaque payload: every "video" (doc_id % 3 = 2
    * → webp stand-in) is cut into fixed-size chunks and every chunk gets a
    * stable content hash — the Spark-side shape of a frame-sampling stage
    * (per-row sequence + transform, map-side; the decode itself stays
    * stubbed since no codecs ship in this container). Chunking happens on
    * the hex rendering so the same bytes hash identically on any engine. */
  private val FrameHexChars = 64 // 32 payload bytes per sampled frame

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Tables(dir).documents
      .where(col("doc_id") % 3 === 2)
      .withColumn("hx", hex(encode(col("text"), "UTF-8")))
      .withColumn("n_frames",
        least(expr(s"(length(hx) + ${FrameHexChars - 1}) div $FrameHexChars").cast("int"), lit(8)))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          s"transform(sequence(0, n_frames - 1), i -> md5(substring(hx, i * $FrameHexChars + 1, $FrameHexChars)))"))
          .as(Seq("frame_idx", "frame_hash")))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"), col("frame_hash"))
  }

  private val frameSampleSql =
    s"""WITH v AS (
       |  SELECT doc_id, hex(encode(text)) AS hx FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT doc_id,
       |    LEAST(CAST(((LENGTH(hx) + ${FrameHexChars - 1}) // $FrameHexChars) AS INT), 8) AS n_frames, hx
       |  FROM v)
       |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(i AS BIGINT) AS frame_idx,
       |  md5(substring(hx, CAST(i * $FrameHexChars + 1 AS INT), $FrameHexChars)) AS frame_hash
       |FROM f, UNNEST(generate_series(0, n_frames - 1)) AS t(i)
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Audio-side plumbing: overlapping PCM analysis windows. The "audio"
    * payloads (doc_id % 3 = 1 stand-ins) are cut into 64-byte frames with
    * a 32-byte hop (50% overlap — the standard STFT layout) and each
    * frame reports exact integer energy (sum of sample bytes) and peak.
    * Per-row expressions only — the frame explosion is bounded (≤12
    * frames/doc) and everything up to the final ordering is map-side.
    * The decode stays a byte-level stub (no codecs in this container);
    * the window geometry, overlap arithmetic and batch shape are the
    * real thing. */
  private val FrameBytes = 64
  private val HopBytes = 32
  private val MaxFrames = 12

  def audioWindows(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Tables(dir).documents
      .where(col("doc_id") % 3 === 1)
      .withColumn("hx", hex(encode(col("text"), "UTF-8")))
      .withColumn("n_bytes", (length(col("hx")) / 2).cast("long"))
      .where(col("n_bytes") >= FrameBytes) // full frames only
      .withColumn("n_frames",
        least(expr(s"(n_bytes - $FrameBytes) div $HopBytes + 1").cast("int"), lit(MaxFrames)))
      // decode each byte ONCE per doc before the frame explode — frames
      // overlap 50%, so per-frame parsing would pay 2× the conv() calls
      // (and the first draft did: 2.9 s → this form at sf0.1)
      .withColumn("bytes", expr(
        s"""transform(sequence(0, cast(n_bytes as int) - 1),
           |  j -> cast(conv(substring(hx, j * 2 + 1, 2), 16, 10) as bigint))""".stripMargin))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"), col("bytes"),
        posexplode(expr(s"sequence(0, n_frames - 1)")).as(Seq("frame_idx", "i")))
      .withColumn("frame", expr(s"slice(bytes, i * $HopBytes + 1, $FrameBytes)"))
      .withColumn("energy", expr("aggregate(frame, 0L, (acc, x) -> acc + x)"))
      .withColumn("peak", expr("array_max(frame)"))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"), col("energy"), col("peak"))
  }

  private def duckByte(hxCol: String, pos: String): String =
    s"((strpos('0123456789ABCDEF', substring($hxCol, $pos, 1)) - 1) * 16 + " +
      s"(strpos('0123456789ABCDEF', substring($hxCol, $pos + 1, 1)) - 1))"

  private val audioWindowsSql = {
    val bytesOfFrame =
      s"list_transform(generate_series(0, ${FrameBytes - 1}), j -> ${duckByte("hx", s"(i * $HopBytes + j) * 2 + 1")})"
    s"""WITH a AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(LENGTH(hex(encode(text))) / 2 AS BIGINT) AS n_bytes
       |  FROM documents WHERE doc_id % 3 = 1),
       |f AS (
       |  SELECT doc_id, n_bytes,
       |    LEAST(CAST((n_bytes - $FrameBytes) // $HopBytes + 1 AS INT), $MaxFrames) AS n_frames, hx
       |  FROM a WHERE n_bytes >= $FrameBytes)
       |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(i AS BIGINT) AS frame_idx,
       |  CAST(list_aggregate($bytesOfFrame, 'sum') AS BIGINT) AS energy,
       |  CAST(list_aggregate($bytesOfFrame, 'max') AS BIGINT) AS peak
       |FROM f, UNNEST(generate_series(0, n_frames - 1)) AS t(i)
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "mm_audio_windows" -> Q(audioWindows _, audioWindowsSql,
      Seq(col("doc_id"), col("frame_idx"))),
    "mm_binary_meta" -> Q(binaryMeta _, binaryMetaSql, Seq(col("doc_id"))),
    "mm_frame_sample" -> Q(frameSample _, frameSampleSql, Seq(col("doc_id"), col("frame_idx"))),
  )
}
