package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared snapshot machinery for idempotent foreachBatch sinks: an
  * applied-batch manifest (replay gate) plus the two-rename atomic
  * publish — the [[AggCache]] discipline factored out so every keyed
  * sink ([[UpsertSink]], [[GapfillSink]]) lands state the same way. */
object Snapshots {

  private def manifest(base: String) = Paths.get(base, "applied_batches.txt")

  private def manifestSet(base: String): Set[Long] =
    if (Files.exists(manifest(base)))
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(manifest(base))).asScala.filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty

  /** The batchId marker carried INSIDE the live snapshot dir (leading
    * underscore so Spark's parquet reader skips it like _SUCCESS). */
  private def currentMarker(base: String): Option[Long] = {
    val m = Paths.get(base, "current", "_batch_id")
    if (Files.exists(m)) Some(new String(Files.readAllBytes(m), "UTF-8").trim.toLong)
    else None
  }

  /** Applied = manifest ∪ the live snapshot's own marker. The union is
    * what closes the publish→record crash window: a crash between the
    * current-swap rename and the manifest append leaves the merged
    * snapshot live with its batchId unrecorded — on restart foreachBatch
    * redelivers that batchId, and without the marker the replay gate
    * would pass and merge the batch a SECOND time (counts/sums silently
    * doubling). The marker travels with the state it describes, so the
    * gate and the state can never disagree. */
  def appliedBatches(base: String): Set[Long] =
    manifestSet(base) ++ currentMarker(base)

  def recordBatch(base: String, batchId: Long): Unit =
    Files.write(manifest(base), s"$batchId\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** The live snapshot, or None at bootstrap. */
  def current(spark: SparkSession, base: String): Option[DataFrame] = {
    val cur = Paths.get(base, "current")
    if (Files.exists(cur)) Some(spark.read.parquet(cur.toString)) else None
  }

  /** Write `df` as version `batchId` and publish it atomically (write →
    * rename current aside → rename new into place; a crash mid-swap
    * leaves the previous snapshot live). The batchId marker is written
    * into the version dir BEFORE the rename, so the swap atomically
    * publishes state and replay-gate evidence together; the outgoing
    * snapshot's marker is healed into the manifest first (it can be
    * missing only if a prior run crashed between its publish and its
    * recordBatch). */
  def publish(base: String, batchId: Long)(write: String => Unit): Unit = {
    Files.createDirectories(Paths.get(base))
    val vdir = Paths.get(base, s"v$batchId")
    write(vdir.toString)
    Files.write(vdir.resolve("_batch_id"), s"$batchId\n".getBytes("UTF-8"))
    currentMarker(base).filterNot(manifestSet(base).contains)
      .foreach(recordBatch(base, _))
    val cur = Paths.get(base, "current")
    val old = Paths.get(base, s".old-$batchId")
    if (Files.exists(cur) && !cur.toFile.renameTo(old.toFile))
      throw new java.io.IOException(s"snapshot swap failed: $cur -> $old")
    if (!vdir.toFile.renameTo(cur.toFile))
      throw new java.io.IOException(s"snapshot swap failed: $vdir -> $cur")
    if (Files.exists(old)) org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }
}

/** §8h(ak) — gap-fill as a live stream: each micro-batch of raw events
  * folds into the landed DAILY STATE (observed-day rollups with exact
  * decimal sums — [[graft.operators.ChangeData.mergeDaily]]), exactly
  * once, atomically published. The gap-filled view renders from state on
  * demand ([[graft.operators.ChangeData.renderGapfill]]) — the stream
  * never recomputes closed days, and late events fold in through the
  * same merge. */
object GapfillSink {
  def applyBatch(spark: SparkSession, base: String)(batch: DataFrame, batchId: Long): Unit = {
    if (Snapshots.appliedBatches(base).contains(batchId)) return
    val merged = Snapshots.current(spark, base) match {
      case Some(state) => graft.operators.ChangeData.mergeDaily(state, batch)
      case None => graft.operators.ChangeData.dailyState(batch)
    }
    Snapshots.publish(base, batchId)(dir => merged.write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  /** The densified per-user series from the landed state. */
  def render(spark: SparkSession, base: String): DataFrame =
    graft.operators.ChangeData.renderGapfill(
      Snapshots.current(spark, base).getOrElse(
        sys.error(s"no gapfill state at $base")))
}
