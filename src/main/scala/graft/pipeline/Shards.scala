package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Packing-shard rebalancer (SURVEY §8e(s)) — the executor behind the
  * `docs_shard_skew` report: move WHOLE training sequences from
  * over-loaded shards to under-loaded ones until every shard sits near
  * the mean token load. Sequences never span shards, so a move is pure
  * metadata — the sequence keeps its (globally unique) seq_id and its
  * document membership; only its location shard changes.
  *
  * Scale shape: the move PLAN is computed driver-side over the bounded
  * per-shard load table (one row per shard — the same frame the skew
  * report aggregates); the EXECUTION never collects per-sequence data.
  * Each hot shard's sequences are ranked newest-first by a per-shard
  * window, their running token total is banded against the plan's
  * per-destination quotas, and the retag is a broadcast join of the
  * ≤|shards|² band table. Newest-first is deliberate: the newest
  * sequences include the partial tail, which is exactly what an
  * incremental packer wants co-located with fresh capacity.
  */
object Shards {

  /** One move band: sequences of `shard` whose newest-first cumulative
    * token count lands in (bandLo, bandHi] relocate to `dest`. */
  final case class MoveBand(shard: Long, bandLo: Long, bandHi: Long, dest: Long)

  /** Driver-side greedy plan over (shard, totalTokens): hot shards
    * (above mean) shed their excess into cold shards' deficits, largest
    * first — the classic balancing heuristic, deterministic (ties break
    * on shard id). Quotas are token counts; the executor moves whole
    * sequences while their running total stays inside the quota band, so
    * realized moves undershoot the quota by at most one sequence. */
  def planMoves(loads: Seq[(Long, Long)]): Seq[MoveBand] = {
    if (loads.size < 2) return Nil
    val mean = loads.map(_._2).sum.toDouble / loads.size
    val hot = loads.collect { case (s, t) if t > mean => (s, (t - mean).toLong) }
      .filter(_._2 > 0).sortBy { case (s, e) => (-e, s) }
    val cold = scala.collection.mutable.Queue(
      loads.collect { case (s, t) if t < mean => (s, (mean - t).toLong) }
        .filter(_._2 > 0).sortBy { case (s, d) => (-d, s) }: _*)
    val bands = Seq.newBuilder[MoveBand]
    var carry: Option[(Long, Long)] = None
    hot.foreach { case (h, excess0) =>
      var excess = excess0
      var cum = 0L
      while (excess > 0 && (carry.nonEmpty || cold.nonEmpty)) {
        val (c, deficit) = carry.getOrElse(cold.dequeue())
        val q = math.min(excess, deficit)
        bands += MoveBand(h, cum, cum + q, c)
        cum += q
        excess -= q
        carry = if (deficit > q) Some((c, deficit - q)) else None
      }
    }
    bands.result()
  }

  /** Rebalance a packing table (doc_id, shard, n_tokens, seq_id,
    * seq_offset — the `docs_pack_sequences` schema): returns the same
    * rows with the `shard` column updated to each sequence's new
    * location. Token totals, sequence membership and offsets are
    * untouched (spec-pinned). */
  def rebalance(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    val seqTot = packed.groupBy(col("shard"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("seq_tokens"))
    val loads = seqTot.groupBy(col("shard")).agg(sum(col("seq_tokens")).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val bands = planMoves(loads)
    if (bands.isEmpty) return packed
    val bandDf = bands.toDF()
    val w = Window.partitionBy(col("shard")).orderBy(col("seq_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sq = seqTot.withColumn("cum", sum(col("seq_tokens")).over(w))
    val moved = sq.as("s")
      .join(broadcast(bandDf.as("b")),
        col("s.shard") === col("b.shard") &&
          col("s.cum") > col("b.bandLo") && col("s.cum") <= col("b.bandHi"),
        "left")
      .select(col("s.seq_id").as("seq_id"),
        coalesce(col("b.dest"), col("s.shard")).as("new_shard"))
    packed.drop("shard")
      .join(moved, Seq("seq_id"))
      .select(col("doc_id"), col("new_shard").as("shard"), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
  }
}
