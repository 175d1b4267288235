package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The torn-swap crash window (r08 advice): `publish` renames
  * current → .old-<id> and then v<id> → current; a crash between the two
  * renames leaves NO current/ — without recovery the next read would
  * report bootstrap and every previously merged register would silently
  * vanish. These tests tear the state apart exactly as each crash point
  * would and assert reads heal it. */
class SnapshotRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshBase(): String =
    Files.createTempDirectory("graft-snaprec").toString + "/state"

  private def publishRows(base: String, batchId: Long, rows: Seq[Long]): Unit = {
    import spark.implicits._
    Snapshots.publish(base, batchId)(dir =>
      rows.toDF("n").write.mode("overwrite").parquet(dir))
    Snapshots.recordBatch(base, batchId)
  }

  private def readRows(base: String): Option[Set[Long]] =
    Snapshots.current(spark, base).map(_.collect().map(_.getLong(0)).toSet)

  test("crash between the two renames: the complete v-dir is promoted, nothing lost") {
    val base = freshBase()
    publishRows(base, 0L, Seq(1L, 2L))
    // simulate batch 1's publish crashing after current -> .old-1 but
    // before v1 -> current: v1 is fully written (marker included)
    Files.createDirectories(Paths.get(base, "v1"))
    spark.range(10, 13).selectExpr("id AS n").write.mode("overwrite")
      .parquet(Paths.get(base, "v1").toString)
    Files.write(Paths.get(base, "v1", "_batch_id"), "1\n".getBytes("UTF-8"))
    assert(Paths.get(base, "current").toFile.renameTo(Paths.get(base, ".old-1").toFile))
    // the torn state: no current/
    assert(!Files.exists(Paths.get(base, "current")))
    // a read heals it to the MERGED snapshot (v1), not empty, not the old state
    assert(readRows(base).contains(Set(10L, 11L, 12L)))
    // and the replay gate sees batch 1 via the marker that rode along
    assert(Snapshots.appliedBatches(base).contains(1L))
    // the .old dir was cleaned up
    assert(!Files.exists(Paths.get(base, ".old-1")))
  }

  test("torn write (v-dir without marker) is NOT promoted; .old restores instead") {
    val base = freshBase()
    publishRows(base, 0L, Seq(7L))
    // v1 crashed mid-write: no _batch_id marker
    Files.createDirectories(Paths.get(base, "v1"))
    assert(Paths.get(base, "current").toFile.renameTo(Paths.get(base, ".old-1").toFile))
    // recovery must fall back to the pre-batch state
    assert(readRows(base).contains(Set(7L)))
    assert(!Files.exists(Paths.get(base, ".old-1")))
    // the incomplete v1 is left for the redelivered batch to overwrite
    assert(Files.exists(Paths.get(base, "v1")))
  }

  test("a healthy tree is untouched and publish still works after recovery") {
    val base = freshBase()
    publishRows(base, 0L, Seq(1L))
    assert(readRows(base).contains(Set(1L)))
    publishRows(base, 1L, Seq(1L, 2L))
    assert(readRows(base).contains(Set(1L, 2L)))
    assert(Snapshots.appliedBatches(base) == Set(0L, 1L))
  }

  test("stale applied-batch v/.old dirs are GC'd on the next healthy publish") {
    val base = freshBase()
    publishRows(base, 0L, Seq(1L))
    publishRows(base, 1L, Seq(1L, 2L))
    // a crash after batch 1's marker write but before its renames would
    // have left a marker-complete v1 behind even though batch 1 is
    // applied; plant that leftover plus a stale .old-0
    Files.createDirectories(Paths.get(base, "v1"))
    Files.write(Paths.get(base, "v1", "_batch_id"), "1\n".getBytes("UTF-8"))
    Files.createDirectories(Paths.get(base, ".old-0"))
    // an UNAPPLIED in-flight version dir must survive the sweep
    Files.createDirectories(Paths.get(base, "v99"))
    Files.write(Paths.get(base, "v99", "_batch_id"), "99\n".getBytes("UTF-8"))
    publishRows(base, 2L, Seq(1L, 2L, 3L))
    assert(!Files.exists(Paths.get(base, "v1")), "applied v-dir not collected")
    assert(!Files.exists(Paths.get(base, ".old-0")), "stale .old dir not collected")
    assert(Files.exists(Paths.get(base, "v99")), "unapplied v-dir wrongly collected")
    assert(readRows(base).contains(Set(1L, 2L, 3L)))
  }
}
