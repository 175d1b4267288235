package graft.streaming

import graft.functions.TextFunctions.words
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest (the §2.3 streaming story extended to the
  * documents domain): the quality gate and content dedup a training-data
  * pipeline runs AS DOCUMENTS LAND, not in a nightly batch.
  *
  * Everything here is either stateless per-row (the gate — trivially
  * streaming-safe, scales with ingest bandwidth) or keyed state with the
  * documented growth bound (content dedup). The scoring expressions are
  * THE SAME columns as the batch `docs_quality_filter`
  * ([[scored]] is shared), so the stream admits exactly the rows the
  * batch filter would keep — spec-pinned.
  */
object DocStreams {

  /** The batch quality columns (doc_id, lang, quality, n_tokens, keep) —
    * single definition used by the batch operator and the stream gate.
    * Works unchanged on batch and streaming frames (pure row-local
    * expressions; nothing here needs a watermark). */
  def scored(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("double")
    val punct = (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?()]", ""))).cast("double")
    val wcol = words(col("text"))
    val nTok = size(wcol).cast("double")
    val quality = round(least(n / lit(500.0), lit(1.0)) * 0.3
      + (lit(1.0) - punct / n) * 0.4
      + (size(filter(wcol, w => w.isin("the", "a", "of", "to", "and", "in", "is", "for"))) / nTok) * 0.3, 6)
    docs.select(col("doc_id"), col("lang"), quality.as("quality"),
        nTok.cast("long").as("n_tokens"))
      .withColumn("keep",
        col("quality") >= 0.5 && col("n_tokens") >= 10 && col("lang") =!= "zh")
  }

  /** Streaming keep-gate: admitted rows only. Stateless — safe in append
    * mode at any scale. */
  def qualityGate(docs: DataFrame): DataFrame =
    scored(docs).where(col("keep")).drop("keep")

  /** Streaming exact dedup on content hash: the first arrival of each
    * md5(text) passes, later copies are dropped by the state store.
    *
    * State grows with the number of DISTINCT documents seen (one 16-byte
    * hash key per doc) — the honest bound for content dedup without an
    * event-time horizon; a deployment that can tolerate re-admitting old
    * content after a horizon switches to `dropDuplicatesWithinWatermark`
    * on an ingest-time column, same plan shape. */
  def dedupByContent(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
}
