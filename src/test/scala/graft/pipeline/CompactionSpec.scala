package graft.pipeline

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: deterministic bin packing over the manifest, one output
  * file per group, no rows lost, efficient files left untouched. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stage parquet files with controlled row counts; returns (dir, counts). */
  private def stage(counts: Seq[Int]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    counts.zipWithIndex.foreach { case (n, i) =>
      (0 until n).map(j => (i.toLong * 1000 + j, s"f$i"))
        .toDF("id", "tag").coalesce(1)
        .write.parquet(s"$dir/in/f$i.parquet")
    }
    dir
  }

  private def manifestOf(dir: String) =
    ZoneMap.build(spark.read.parquet(s"$dir/in/*"), Seq("id")).localCheckpoint()

  test("plan: FFD packing respects the target, skips big files and singletons") {
    val dir = stage(Seq(60, 50, 40, 30, 120)) // target 100: f4 exempt (>=100)
    val plan = Compaction.plan(manifestOf(dir), targetRows = 100L)
    val groups = plan.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    def f(i: Int) = groups.find(_.exists(_.contains(s"f$i.parquet")))
    // FFD: 60+40 pack together, 50+30 pack together, 120 never appears
    assert(plan.map(_._1).forall(!_.contains("f4.parquet")))
    assert(f(0).isDefined && f(0) == f(2), "60 and 40 share a group")
    assert(f(1).isDefined && f(1) == f(3), "50 and 30 share a group")
    assert(groups.size == 2)
  }

  test("compact: one file per group, all rows preserved") {
    val dir = stage(Seq(60, 50, 40, 30, 120))
    val plan = Compaction.plan(manifestOf(dir), targetRows = 100L)
    val summary = Compaction.compact(spark, plan, s"$dir/out",
      fs => spark.read.parquet(fs: _*))
    val rows = summary.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == 60 + 50 + 40 + 30)
    // exactly one data file per group directory
    rows.keys.foreach { g =>
      val files = new java.io.File(s"$dir/out/compaction_group=$g")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"group $g has ${files.length} files")
    }
    // content survives: ids of the 4 small files all present exactly once
    val out = spark.read.parquet(s"$dir/out")
    assert(out.select("id").distinct().count() == out.count())
    val expected = spark.read.parquet(s"$dir/in/*")
      .where(col("tag") =!= "f4").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(out.select("id").collect().map(_.getLong(0)).toSet == expected)
  }

  /** Stage parquet files with controlled VALUE RANGES (10 rows each). */
  private def stageRanges(ranges: Seq[Range]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-range").toString
    ranges.zipWithIndex.foreach { case (r, i) =>
      r.map(v => (v.toLong, s"f$i")).toDF("id", "tag").coalesce(1)
        .write.parquet(s"$dir/in/f$i.parquet")
    }
    dir
  }

  test("planByRange: groups are contiguous runs in value order, not size order") {
    // ranges deliberately interleaved against file-name order
    val dir = stageRanges(Seq(0 until 10, 1000 until 1010, 10 until 20,
      1010 until 1020, 2000 until 2010, 2010 until 2020))
    val plan = Compaction.planByRange(manifestOf(dir), "id", targetRows = 20L)
    val groups = plan.groupBy(_._2).values
      .map(_.map(t => t._1.replaceAll(".*/(f\\d+)\\.parquet.*", "$1")).toSet).toSet
    assert(groups == Set(Set("f0", "f2"), Set("f1", "f3"), Set("f4", "f5")))
  }

  test("planByRange keeps zone-map pruning tight after the rewrite") {
    val dir = stageRanges(Seq(0 until 10, 1000 until 1010, 10 until 20,
      1010 until 1020, 2000 until 2010, 2010 until 2020))
    val plan = Compaction.planByRange(manifestOf(dir), "id", targetRows = 20L)
    Compaction.compact(spark, plan, s"$dir/out", fs => spark.read.parquet(fs: _*))
    val zmOut = ZoneMap.build(spark.read.parquet(s"$dir/out"), Seq("id"))
    // a 2-value point-ish predicate hits exactly ONE compacted file; a
    // size-only packing could smear [0,19] and [2000,2019] into one file
    // whose interval covers everything in between
    val hit = ZoneMap.candidateFiles(zmOut, "id", lit(5L), lit(6L))
    assert(hit.size == 1, s"expected 1 candidate file, got ${hit.size}")
    val hitMid = ZoneMap.candidateFiles(zmOut, "id", lit(500L), lit(600L))
    assert(hitMid.isEmpty, "gap between runs must prune to zero files")
    // no rows lost
    assert(spark.read.parquet(s"$dir/out").count() == 60L)
  }

  test("compact with sortCol writes each group's rows in value order") {
    val dir = stageRanges(Seq(0 until 10, 1000 until 1010, 10 until 20,
      1010 until 1020, 2000 until 2010, 2010 until 2020))
    val plan = Compaction.planByRange(manifestOf(dir), "id", targetRows = 20L)
    Compaction.compact(spark, plan, s"$dir/out", fs => spark.read.parquet(fs: _*),
      sortCol = Some("id"))
    val groups = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("compaction_group="))
    assert(groups.nonEmpty)
    groups.foreach { g =>
      val f = g.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(f.length == 1)
      // a single small file reads back as one partition in file order
      val ids = spark.read.parquet(f.head.getAbsolutePath)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"group ${g.getName} not value-ordered")
    }
  }

  test("plan is deterministic and empty when nothing needs compacting") {
    val dir = stage(Seq(200, 300))
    assert(Compaction.plan(manifestOf(dir), targetRows = 100L).isEmpty)
    val dir2 = stage(Seq(10, 20, 30))
    val p1 = Compaction.plan(manifestOf(dir2), targetRows = 100L)
    val p2 = Compaction.plan(manifestOf(dir2), targetRows = 100L)
    assert(p1 == p2 && p1.nonEmpty)
  }
}
