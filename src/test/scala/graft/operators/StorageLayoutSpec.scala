package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout planners pinned against driver recomputes: the
  * compaction manifest's first-fit shard assignment and the z-order
  * layout audit's bit-interleave, file zones, and pruning arithmetic. */
class StorageLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction plan matches a first-fit driver recompute") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        val shard = cum / 2000L
        cum += n
        (src, shard, id, n)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((src, shard), rows) =>
      (src, shard, rows.size.toLong, rows.map(_._4).sum, rows.map(_._3).min, rows.map(_._3).max)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = StorageQueries.compactionPlan(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
    // every shard except possibly each source's last stays under
    // target + one max doc: first-fit never splits a doc
    assert(got.forall(_._4 > 0))
  }

  test("compaction delta over a doc_id prefix split equals the full recompute") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("source", "doc_id", "n_chars")
    val cut = docs.agg(expr("percentile_approx(doc_id, 0.6)")).head().getLong(0)
    val full = StorageQueries.compactionPlan(spark, TestSpark.Sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(t => (t._1, t._2))
    // replay-as-one-batch over an empty prior == the batch planner
    val empty = Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("source", "shard", "n_docs", "total_chars", "first_doc", "last_doc")
    assert(rows(StorageQueries.compactionDelta(empty, docs)) == rows(full))
    // prefix manifest + suffix batch == full recompute (append-only merge)
    val prior = StorageQueries.compactionDelta(empty, docs.where($"doc_id" <= cut))
    val merged = StorageQueries.compactionDelta(prior, docs.where($"doc_id" > cut))
    assert(rows(merged) == rows(full) && rows(full).nonEmpty)
  }

  test("z-order long lane equals the decimal overflow-fallback lane") {
    val got = StorageQueries.zorderLayout(spark, TestSpark.Sf0001)
      .orderBy("layout").collect().map(_.toSeq).toSeq
    val want = StorageQueries.zorderLayoutImpl(spark, TestSpark.Sf0001, forceDecimal = true)
      .orderBy("layout").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("z-order audit matches the driver interleave and prunes better than linear") {
    def spread(v: Long): Long = {
      var s = (v | (v << 8)) & 0x00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0FL
      s = (s | (s << 2)) & 0x33333333L
      (s | (s << 1)) & 0x55555555L
    }
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxO = li.map(_._1).max
    val maxP = li.map(_._2).max
    val lo = maxP * 10 / 100
    val hi = maxP * 12 / 100
    val assigned = li.flatMap { case (o, p) =>
      val x = o * 65536 / (maxO + 1)
      val y = p * 65536 / (maxP + 1)
      val z = spread(x) | (spread(y) << 1)
      Seq(("linear", o * 256 / (maxO + 1), p), ("zorder", z / (1L << 24), p))
    }
    val expect = assigned.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((layout, _), rows) =>
        (layout, rows.map(_._3).min, rows.map(_._3).max, rows.size.toLong)
      }
      .groupBy(_._1).toSeq.map { case (layout, files) =>
        val nRows = files.map(_._4).sum
        val hit = files.filter(f => f._2 <= hi && f._3 >= lo)
        val rowsHit = hit.map(_._4).sum
        (layout, files.size.toLong, nRows, hit.size.toLong, rowsHit,
          (nRows - rowsHit) * 1000 / nRows)
      }.sortBy(_._1)
    val got = StorageQueries.zorderLayout(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got == expect)
    // the audit's whole point: the z-order layout prunes strictly more
    val prune = got.map(t => t._1 -> t._6).toMap
    assert(prune("zorder") > prune("linear"))
  }
}
