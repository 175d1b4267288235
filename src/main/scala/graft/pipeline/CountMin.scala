package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable count-min frequency sketch, represented the Spark-first way:
  * a TABLE of (grain, row, cell, cnt) rather than an opaque blob — so
  * building is one hash-aggregate, merging across grains is groupBy-sum
  * (exact, not approximate: the cells are plain counters), point queries
  * are a broadcast-friendly join, and the sketch persists/compacts/prunes
  * like any other dataset (the HLL layer's "sketch per grain, persist,
  * union on demand" pattern, for FREQUENCIES instead of distincts).
  *
  * The classic trade: estimates are never UNDER the true count, and
  * overestimate by at most ε·N (ε ≈ e/width) with probability 1−δ
  * (δ ≈ exp(−depth)) — heavy hitters survive exactly, the long tail blurs
  * upward. At 100 TB the sketch is depth×width counters per grain no
  * matter how many distinct keys stream through — token-frequency
  * tracking with bounded state. Row hashes are salted xxhash64, so both
  * build and probe sides derive cells map-side with no shared dictionary.
  */
object CountMin {

  final case class Config(depth: Int = 4, width: Int = 2048)

  private def cell(key: Column, row: Int, width: Int): Column =
    pmod(xxhash64(lit(row), key), lit(width.toLong)).cast("int")

  private def rowCells(key: Column, cfg: Config): Column =
    array((0 until cfg.depth).map(r =>
      struct(lit(r).as("row"), cell(key, r, cfg.width).as("cell"))): _*)

  /** Build a per-grain sketch table (grain, row, cell, cnt) — one explode
    * (×depth) and one hash aggregate with map-side partials. */
  def build(df: DataFrame, key: Column, grain: Column, cfg: Config = Config()): DataFrame =
    df.select(grain.as("grain"), explode(rowCells(key, cfg)).as("rc"))
      .groupBy(col("grain"), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Collapse sketches across grains into one — EXACT (counter sums). */
  def merge(sketch: DataFrame): DataFrame =
    sketch.groupBy(col("row"), col("cell")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a one-column (`key`) frame against a merged
    * sketch: min over the depth rows; an unseen key estimates 0. */
  def estimate(merged: DataFrame, keys: DataFrame, cfg: Config = Config()): DataFrame =
    keys.select(col("key"), explode(rowCells(col("key"), cfg)).as("rc"))
      .select(col("key"), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(merged, Seq("row", "cell"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Equi-join SIZE estimate from two merged sketches (AMS/count-min inner
    * product): per depth row, Σ_cell cntA·cntB; the estimate is the min
    * over rows. Never UNDER the true |A ⋈ B| (collisions only add), over
    * by at most ε·|A|·|B| per the count-min bound — the shuffle-sizing
    * primitive: two sketch tables join on (row, cell) — depth×width rows
    * each, broadcast-sized regardless of input scale — and answer "how
    * big is this join" without touching either input again. */
  def joinSize(ma: DataFrame, mb: DataFrame): DataFrame =
    ma.select(col("row"), col("cell"), col("cnt").as("ca"))
      .join(mb.select(col("row"), col("cell"), col("cnt").as("cb")), Seq("row", "cell"))
      .groupBy(col("row")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est"))
}
