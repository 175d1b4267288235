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

  test("plan is deterministic and empty when nothing needs compacting") {
    val dir = stage(Seq(200, 300))
    assert(Compaction.plan(manifestOf(dir), targetRows = 100L).isEmpty)
    val dir2 = stage(Seq(10, 20, 30))
    val p1 = Compaction.plan(manifestOf(dir2), targetRows = 100L)
    val p2 = Compaction.plan(manifestOf(dir2), targetRows = 100L)
    assert(p1 == p2 && p1.nonEmpty)
  }
}
