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

  /** ADVICE r13 — code-version token folded into every signature: staged
    * artifacts were gated only on the SOURCE's (size, mtime), so a change
    * to a builder's formula kept serving the stale frame built by the
    * prior code version until /tmp was cleared or the oracle gate caught
    * it. Bump this constant whenever ANY staged builder's output formula
    * changes; every stage then reads as stale exactly once and rebuilds
    * under the new code. */
  private[operators] val StageVersion = "s14"

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
      StageVersion + "|" + parts
        .map(f => s"${f.getFileName}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .mkString("|")
    } else if (Files.exists(p))
      s"$StageVersion|${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    else s"$StageVersion|absent"
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

  /** Read a staged artifact with file splits sized to the ARTIFACT, not
    * the global 128 MB default (r13): staged frames are byte-slim —
    * dictionary-coded longs land 14M rows in 28 MB — so the default
    * split packs the scan into 1–2 tasks and everything before the
    * plan's first exchange (explodes, join/aggregate map sides, persist
    * materializations, and the CACHED partitioning itself) runs
    * near-serial however the later plan is partitioned (measured: the
    * copresence serving read was 15.5 s scan-bound, 8.6 s after this).
    * Splits target `targetTasks` with a 1 MB floor; the read goes
    * through a child session (shared SparkContext, cache, and catalog —
    * only the SQLConf differs), so no other query's sizing is touched.
    *
    * WHEN TO USE (r13, measured): ONLY for reads whose downstream work
    * before the first exchange is heavy AND single-pass (the copresence
    * heap pass). Switching ALL staged readers to this was built and
    * REJECTED on measurement — the graph/verify families got SLOWER
    * (five-query sf1 subset 52.9 → 62.6 s: their staged frames persist
    * and feed iterative consumers, where 64 tiny cached partitions add
    * per-task overhead on every iteration and the first shuffle already
    * re-spreads the work). Default stays `spark.read.parquet`. */
  def read(spark: org.apache.spark.sql.SparkSession, stage: String,
           targetTasks: Int = 64): org.apache.spark.sql.DataFrame = {
    val split = math.max(1L << 20, bytes(stage) / math.max(targetTasks, 1))
    readSession(spark, split).read.parquet(stage)
  }

  /** Data bytes of a staged artifact. ADVICE r13: sum only the *.parquet
    * part files — _SUCCESS / .crc sidecars are not data and skewed the
    * computed split slightly low. Also the size signal for scale-gated
    * execution choices ([[LoopConf.noAqeBelow]]). */
  private[operators] def bytes(stage: String): Long = {
    val p = Paths.get(stage)
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".parquet"))
        .map(Files.size).sum
      finally listing.close()
    } else if (Files.exists(p)) Files.size(p) else 0L
  }

  /** ADVICE r13: one child session PER (context, split size), reused —
    * `newSession()` on every read accumulated SessionState objects for
    * the life of the JVM under repeated invocations. The cache key
    * includes the parent's SparkContext so a stopped context's sessions
    * are never served to a fresh one (each test JVM / restart gets its
    * own entries; stale ones are dropped on sight). */
  private val readSessions =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.SparkContext, Long),
      org.apache.spark.sql.SparkSession]

  private def readSession(spark: org.apache.spark.sql.SparkSession,
                          split: Long): org.apache.spark.sql.SparkSession = {
    readSessions.filterInPlace((k, _) => !k._1.isStopped)
    readSessions.getOrElseUpdate((spark.sparkContext, split), {
      val rs = spark.newSession()
      rs.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
      rs.conf.set("spark.sql.files.openCostInBytes", "0")
      rs
    })
  }

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
