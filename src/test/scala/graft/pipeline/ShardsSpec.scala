package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rebalancer: moves must conserve tokens and membership, reduce the
  * spread, and be deterministic. */
class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def packed = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.operators.CorpusQueries.queries("docs_pack_sequences")
      .fn(spark, TestSpark.Sf0001)
  }

  private def loadsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("planMoves: quotas pair every excess with a deficit, bands are contiguous per shard") {
    val loads = Seq((0L, 100L), (1L, 300L), (2L, 50L), (3L, 150L))
    val bands = Shards.planMoves(loads)
    assert(bands.nonEmpty)
    // total planned movement equals total excess over the mean (150)
    assert(bands.map(b => b.bandHi - b.bandLo).sum == 150L)
    bands.groupBy(_.shard).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.bandLo)
      assert(sorted.head.bandLo == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.bandHi == b.bandLo)
        case _ =>
      }
    }
    // destinations are genuinely cold shards
    val mean = loads.map(_._2).sum / loads.size
    val byShard = loads.toMap
    bands.foreach(b => assert(byShard(b.dest) < mean))
  }

  test("rebalance conserves tokens + membership and narrows the spread") {
    val before = packed.localCheckpoint()
    val after = Shards.rebalance(before).localCheckpoint()
    // conservation
    assert(after.count() == before.count())
    assert(after.agg(sum("n_tokens")).head.getLong(0) ==
      before.agg(sum("n_tokens")).head.getLong(0))
    // membership + offsets untouched: every (doc_id, seq_id, seq_offset,
    // n_tokens) row survives identically
    val keyB = before.select("doc_id", "seq_id", "seq_offset", "n_tokens")
      .collect().map(_.toSeq).toSet
    val keyA = after.select("doc_id", "seq_id", "seq_offset", "n_tokens")
      .collect().map(_.toSeq).toSet
    assert(keyA == keyB)
    // each sequence lives on exactly one shard
    assert(after.groupBy("seq_id").agg(countDistinct("shard").as("n"))
      .where(col("n") =!= 1).count() == 0)
    // the spread narrows (or at worst stays — moves are whole sequences)
    val lb = loadsOf(before); val la = loadsOf(after)
    val spreadB = lb.values.max - lb.values.min
    val spreadA = la.values.max - la.values.min
    assert(spreadA <= spreadB, s"spread grew: $spreadB -> $spreadA")
    // determinism
    val again = Shards.rebalance(before)
      .select("doc_id", "shard", "seq_id").collect().map(_.toSeq).toSet
    assert(again == after.select("doc_id", "shard", "seq_id").collect().map(_.toSeq).toSet)
  }

  test("rebalance is a no-op on an already balanced table") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val flat = (0L until 4L).flatMap(sh =>
      (0L until 5L).map(i => (sh * 100 + i, sh, 100L, sh * 1000000L + i, 0L)))
      .toDF("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")
    val out = Shards.rebalance(flat)
    assert(out.select("doc_id", "shard").collect().map(_.toSeq).toSet ==
      flat.select("doc_id", "shard").collect().map(_.toSeq).toSet)
  }
}
