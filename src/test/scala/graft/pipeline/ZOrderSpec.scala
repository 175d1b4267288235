package graft.pipeline

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Z-order clustering: address arithmetic, rectangle-pruning advantage
  * over a single-column sort, and scan correctness through the zone map. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zAddress interleaves bits (known Morton values)") {
    // (a=0b11, b=0b01) -> bits: a0->0, b0->1, a1->2, b1->3 => 0b0111 = 7
    val rows = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (7L, 7L))
      .toDF("a", "b")
      .select(ZOrder.zAddress(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(7L, 0L, 1L, 2L, 63L))
  }

  test("quantize clamps to [0, 2^bits) and preserves order") {
    val q = Seq(0.0, 25.0, 50.0, 99.9, 100.0)
      .toDF("v")
      .select(ZOrder.quantize(col("v"), lit(0.0), lit(100.0), 4).as("c"))
      .as[Long].collect().toSeq
    assert(q.head == 0L && q.last == 15L)
    assert(q == q.sorted)
  }

  /** A 64×64 grid of (x, y) points: Z-order files are rectangles, a
    * y-sorted layout gives y-stripes. */
  private lazy val (zDir, yDir) = {
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"),
        col("id").as("payload"))
    val zd = Files.createTempDirectory("graft-zorder").toString
    ZOrder.layout(grid, "x", "y", zd, nFiles = 16, bits = 6)
    val yd = Files.createTempDirectory("graft-ysort").toString
    grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(yd)
    (zd, yd)
  }

  private def files(dir: String) =
    spark.read.parquet(dir).select(input_file_name()).distinct().count()

  test("rectangle query prunes on BOTH axes under z-order, one axis under y-sort") {
    val zm = ZoneMap.build(spark.read.parquet(zDir), Seq("x", "y")).cache()
    val ym = ZoneMap.build(spark.read.parquet(yDir), Seq("x", "y")).cache()
    val rect = Seq(
      ("x", lit(8L), lit(15L)), ("y", lit(8L), lit(15L)))
    val zFiles = rect.map { case (c, lo, hi) => ZoneMap.candidateFiles(zm, c, lo, hi).toSet }
      .reduce(_ intersect _)
    val yFiles = rect.map { case (c, lo, hi) => ZoneMap.candidateFiles(ym, c, lo, hi).toSet }
      .reduce(_ intersect _)
    // an 1/8 x 1/8 rectangle: the z-layout reads a strict subset of files;
    // the y-sorted layout prunes only via y (x-min/max spans every stripe)
    assert(zFiles.size < yFiles.size,
      s"z-order (${zFiles.size} files) must beat single-sort (${yFiles.size})")
    assert(yFiles.size <= 16 && zFiles.nonEmpty)
  }

  test("rectScan returns exactly the full-scan rows") {
    val zm = ZoneMap.build(spark.read.parquet(zDir), Seq("x", "y"))
    val rect = Seq(("x", lit(20L), lit(33L)), ("y", lit(5L), lit(11L)))
    val pruned = ZOrder.rectScan(spark, zDir, zm, rect)
      .select("payload").as[Long].collect().sorted.toSeq
    val full = spark.read.parquet(zDir)
      .where(col("x").between(20, 33) && col("y").between(5, 11))
      .select("payload").as[Long].collect().sorted.toSeq
    assert(pruned == full && pruned.nonEmpty)
  }

  test("empty rectangle reads nothing") {
    val zm = ZoneMap.build(spark.read.parquet(zDir), Seq("x", "y"))
    val none = ZOrder.rectScan(spark, zDir, zm,
      Seq(("x", lit(500L), lit(600L)), ("y", lit(0L), lit(63L))))
    assert(none.count() == 0)
  }
}
