package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering layout: interleave the bits of two
  * quantized sort keys so files are rectangles in (a, b) space instead of
  * stripes along one axis — the layout trick behind Delta/Iceberg
  * multi-dimensional clustering, built here on the engine's own
  * [[ZoneMap]] manifest.
  *
  * Why it matters at 100 TB: a single-column sort gives file pruning on
  * that column only; a predicate on the OTHER column touches every file.
  * Z-ordering bounds each file's extent in BOTH columns, so the zone map
  * prunes rectangle queries on either (or both) axes. The address is a
  * static 2·bits-term bitwise expression tree — whole-stage-codegen
  * friendly, no UDF — and the layout write is one `repartitionByRange`
  * (range exchange on the address) + in-partition sort, exactly the
  * shuffle a single-column clustered write already pays.
  */
object ZOrder {

  /** Linear quantization of `c` into [0, 2^bits): the per-column scale
    * (lo, hi) comes from table stats (one cheap agg, or the zone map
    * itself), never hard-coded. Values at `hi` land in the top cell. */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = lit((1L << bits) - 1)
    least(greatest(
      floor((c.cast("double") - lo) / (hi - lo + lit(1e-9)) * (cells + 1)).cast("long"),
      lit(0L)), cells)
  }

  /** Morton address: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    * Both inputs must already be quantized to [0, 2^bits). */
  def zAddress(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Write `df` clustered by the Z-address of (`a`, `b`) into ~`nFiles`
    * range partitions. Column scales are measured in one aggregate pass;
    * the write is range-exchange + local sort (no global sort, no
    * driver-side data). Returns the output path for chaining into
    * [[ZoneMap.build]]. */
  def layout(df: DataFrame, a: String, b: String, outDir: String,
             nFiles: Int, bits: Int = 16): String = {
    val stats = df.agg(
      min(col(a)).cast("double").as("alo"), max(col(a)).cast("double").as("ahi"),
      min(col(b)).cast("double").as("blo"), max(col(b)).cast("double").as("bhi"))
      .collect()(0) // 1 row: the two column scales
    val z = zAddress(
      quantize(col(a), lit(stats.getDouble(0)), lit(stats.getDouble(1)), bits),
      quantize(col(b), lit(stats.getDouble(2)), lit(stats.getDouble(3)), bits),
      bits)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  /** Rectangle scan through the zone map: intersect the per-column
    * candidate file sets (each bounded, driver-side — this is scheduler
    * work), read only the surviving files, re-apply both predicates as
    * the residual row filter. On a Z-ordered layout BOTH dimensions
    * prune; on a single-column sort only one does. */
  def rectScan(spark: SparkSession, dir: String, zoneMap: DataFrame,
               preds: Seq[(String, Column, Column)]): DataFrame = {
    val files = preds
      .map { case (c, lo, hi) => ZoneMap.candidateFiles(zoneMap, c, lo, hi).toSet }
      .reduce(_ intersect _)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(files.toSeq.sorted: _*)
    preds.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.where(col(c) >= lo && col(c) <= hi)
    }
  }
}
