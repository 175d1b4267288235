package graft.operators

import java.nio.file.{Files, Paths}

/** Content-signature staging skip — the reference pipeline's incremental
  * discipline (scripts/sync.py: downstream work re-runs only when the
  * `file checksum` signal changes) applied to locally staged derived files.
  *
  * A staged directory `stage` is CURRENT when `<stage>.sig` records the same
  * signature as the source it was derived from. The signature is the
  * source's (size, mtime) — cheap, no content read — which is exactly the
  * granularity the drop-zone sync uses to decide whether to rehash. The
  * `.sig` file lives NEXT to the directory, never inside it, so datasource
  * readers that glob the directory never see it as data.
  */
object Stage {

  private[operators] def signature(sourcePath: String): String = {
    val p = Paths.get(sourcePath)
    if (Files.isDirectory(p)) {
      // parquet "file" may be a directory of part files: fold their stats.
      // Files.list returns a Stream backed by an open DirectoryStream —
      // close it or every signature() on a directory leaks a descriptor.
      val listing = Files.list(p)
      val parts =
        try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(Files.isRegularFile(_)).sortBy(_.toString)
        finally listing.close()
      parts.map(f => s"${f.getFileName}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .mkString("|")
    } else if (Files.exists(p))
      s"${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    else "absent"
  }

  private def sigFile(stage: String) = Paths.get(stage + ".sig")

  /** True iff `stage` was last recorded against the current state of
    * `sourcePath` (and the stage itself still exists). */
  def current(stage: String, sourcePath: String): Boolean =
    Files.exists(Paths.get(stage)) && Files.exists(sigFile(stage)) &&
      new String(Files.readAllBytes(sigFile(stage)), "UTF-8") == signature(sourcePath)

  /** Record that `stage` now reflects `sourcePath`'s current state. */
  def record(stage: String, sourcePath: String): Unit =
    Files.write(sigFile(stage), signature(sourcePath).getBytes("UTF-8"))

  /** Build-if-stale with the sig invalidated FIRST: a `mode(overwrite)`
    * rewrite deletes and re-creates the stage directory, and a stale `.sig`
    * surviving into that window would let a later `current` call serve a
    * partially written stage. Deleting the sig before `build` runs NARROWS
    * that window for the single-process, sequential harness this gates
    * (one driver, one ensure at a time): a crash mid-build leaves no sig,
    * so the next run rebuilds instead of reading torn data. It is NOT a
    * multi-process guarantee — a reader that passed `current` just before
    * the delete can still observe the overwrite, and two processes
    * building the same stage concurrently interleave destructively. A
    * shared deployment needs write-to-temp + atomic rename (the
    * [[graft.pipeline.AggCache]] swap discipline) or an external lock. */
  def ensure(stage: String, sourcePath: String)(build: => Unit): Unit =
    if (!current(stage, sourcePath)) {
      Files.deleteIfExists(sigFile(stage))
      build
      record(stage, sourcePath)
    }
}
