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
    * gate and the state can never disagree. Reads run [[recover]] first,
    * so a swap torn between the two renames is healed before the gate
    * is consulted. */
  def appliedBatches(base: String): Set[Long] = {
    recover(base)
    manifestSet(base) ++ currentMarker(base)
  }

  /** Heal a torn two-rename swap (the ZoneMap manifest-restore logic
    * transposed to snapshot dirs): a crash after `current → .old-<id>`
    * but before `v<id> → current` leaves NO live snapshot — without
    * recovery the next batch would bootstrap EMPTY state and every
    * previously merged count would silently vanish. When current/ is
    * missing: promote the newest marker-complete `v<id>` (it is the
    * fully-written merged snapshot the crashed publish was about to
    * swap in — the marker is written before any rename, so its presence
    * proves the write finished); with no such version dir, restore the
    * newest `.old-<id>` (the pre-batch state; the redelivered batch
    * re-merges against it). Either way, lingering `.old-*` dirs are
    * removed once a live snapshot exists again. Marker-less v dirs are
    * left alone — a torn `write()` is overwritten by the redelivered
    * batch's own publish. */
  private def recover(base: String): Unit = {
    val cur = Paths.get(base, "current")
    val root = Paths.get(base)
    if (Files.exists(cur) || !Files.exists(root)) return
    def named(prefix: String): Seq[(Long, java.nio.file.Path)] = {
      val s = Files.list(root)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter(p => p.getFileName.toString.startsWith(prefix))
        .flatMap(p => p.getFileName.toString.stripPrefix(prefix).toLongOption.map(_ -> p))
        .toSeq.sortBy(-_._1)
      finally s.close()
    }
    val complete = named("v").filter { case (_, p) => Files.exists(p.resolve("_batch_id")) }
    val source = complete.headOption.orElse(named(".old-").headOption)
    source.foreach { case (_, p) =>
      if (!p.toFile.renameTo(cur.toFile))
        throw new java.io.IOException(s"snapshot recovery failed: $p -> $cur")
      named(".old-").foreach { case (_, o) =>
        org.apache.commons.io.FileUtils.deleteDirectory(o.toFile)
      }
    }
  }

  def recordBatch(base: String, batchId: Long): Unit =
    Files.write(manifest(base), s"$batchId\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** The live snapshot (after torn-swap recovery), or None at true
    * bootstrap. */
  def current(spark: SparkSession, base: String): Option[DataFrame] = {
    recover(base)
    val cur = Paths.get(base, "current")
    if (Files.exists(cur)) Some(spark.read.parquet(cur.toString)) else None
  }

  /** Write `df` as version `batchId` and publish it atomically (write →
    * rename current aside → rename new into place). A crash mid-swap is
    * healed by [[recover]] on the next read or publish — between the two
    * renames there is an instant with no current/, which recovery
    * resolves to the newest complete state rather than an empty
    * bootstrap. The batchId marker is written into the version dir
    * BEFORE the rename, so the swap atomically publishes state and
    * replay-gate evidence together; the outgoing snapshot's marker is
    * healed into the manifest first (it can be missing only if a prior
    * run crashed between its publish and its recordBatch). */
  def publish(base: String, batchId: Long)(write: String => Unit): Unit = {
    Files.createDirectories(Paths.get(base))
    recover(base)
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
    gcStale(base)
  }

  /** GC stale `v<id>` / `.old-<id>` dirs whose batch is already applied:
    * a crash after the marker write but before the renames leaves a
    * marker-complete v-dir that [[recover]] never touches once a newer
    * snapshot is live (it is never wrongly promoted — a newer complete
    * v-dir always wins — but it leaks disk and confuses inspection), and
    * recover's own `.old-*` cleanup only runs when it PROMOTES
    * something. Runs on the healthy path after every successful publish;
    * only ids in the applied set are touched, so an in-flight publish's
    * not-yet-applied v-dir is never collected. */
  private def gcStale(base: String): Unit = {
    val root = Paths.get(base)
    val cur = Paths.get(base, "current")
    if (!Files.exists(cur)) return // never collect while there is no live snapshot
    val applied = manifestSet(base) ++ currentMarker(base)
    val s = Files.list(root)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter { p =>
        val n = p.getFileName.toString
        val id = if (n.startsWith(".old-")) n.stripPrefix(".old-").toLongOption
        else if (n.startsWith("v")) n.stripPrefix("v").toLongOption
        else None
        id.exists(applied.contains)
      }
      .foreach(p => org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
    finally s.close()
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
