package graft.pipeline

import java.nio.file.Files

import graft.TestSpark
import graft.sources.{ColSpec, DelimitedConfig, DelimitedSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zone-map-driven scan planning over the config-driven delimited source:
  * only files whose [min,max] can satisfy the predicate are opened, and
  * the result is identical to the unpruned read + filter. */
class DelimitedPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cfg = DelimitedConfig(
    delimiter = ";", header = true,
    columns = Seq(ColSpec("id", "long"), ColSpec("val", "string")))

  /** Three files with disjoint id ranges. */
  private def stage(): String = {
    val dir = Files.createTempDirectory("graft-dprune").toString
    Seq(0, 1, 2).foreach { i =>
      val lines = "id;val" +: (0 until 10).map(j => s"${i * 100 + j};v${i}_$j")
      Files.write(java.nio.file.Paths.get(dir, s"part-$i.csv"),
        String.join("\n", lines: _*).getBytes)
    }
    dir
  }

  test("pruned read opens only overlapping files, result equals unpruned filter") {
    val dir = stage()
    val manifest = ZoneMap.build(DelimitedSource.read(spark, dir, cfg), Seq("id"))
      .localCheckpoint()
    val pruned = ZoneMap.prunedDelimited(spark, dir, cfg, manifest, "id", lit(100L), lit(109L))
    // only the middle file survives the scheduler-side prune
    assert(pruned.inputFiles.toSeq.map(f => f.substring(f.lastIndexOf('/') + 1)).sorted
      == Seq("part-1.csv"))
    val expect = DelimitedSource.read(spark, dir, cfg)
      .where(col("id").between(100L, 109L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned.collect().map(r => (r.getLong(0), r.getString(1))).toSet == expect)
    assert(expect.size == 10)
  }

  test("predicate outside every range reads zero rows from an empty relation") {
    val dir = stage()
    val manifest = ZoneMap.build(DelimitedSource.read(spark, dir, cfg), Seq("id"))
      .localCheckpoint()
    val none = ZoneMap.prunedDelimited(spark, dir, cfg, manifest, "id", lit(5000L), lit(6000L))
    assert(none.count() == 0)
  }

  test("straddling predicate keeps both touched files, drops the third") {
    val dir = stage()
    val manifest = ZoneMap.build(DelimitedSource.read(spark, dir, cfg), Seq("id"))
      .localCheckpoint()
    val two = ZoneMap.prunedDelimited(spark, dir, cfg, manifest, "id", lit(9L), lit(100L))
    assert(two.inputFiles.toSeq.map(f => f.substring(f.lastIndexOf('/') + 1)).sorted
      == Seq("part-0.csv", "part-1.csv"))
    assert(two.collect().map(_.getLong(0)).toSet == Set(9L, 100L))
  }
}
