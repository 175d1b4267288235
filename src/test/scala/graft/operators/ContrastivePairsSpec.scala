package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-recompute pins for the contrastive-training family
  * (docs_training_pairs / docs_hard_negatives) and the tokenizer
  * fertility audit — the r07 post-close queries brought under the guard
  * system, plus the r08 hard-negative miner. */
class ContrastivePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private lazy val verify = DedupQueries.queries("dedup_cosine_verify").fn(spark, dir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

  private lazy val pairs = DedupQueries.queries("docs_training_pairs").fn(spark, dir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))

  test("training pairs: positive is the anchor's best verified partner (driver recompute)") {
    // recompute best partner per anchor from the verify output: max cos,
    // lowest partner id on ties
    val directed = verify.filter(_._4).flatMap { case (a, b, cos, _) =>
      Seq((a, b, cos), (b, a, cos))
    }
    val want = directed.groupBy(_._1).map { case (anchor, rows) =>
      val best = rows.maxBy { case (_, p, c) => (c, -p) }
      anchor -> ((best._2, best._3))
    }
    val got = pairs.map { case (a, p, c, _, _) => a -> ((p, c)) }.toMap
    assert(pairs.nonEmpty)
    assert(got == want)
  }

  test("training pairs: negatives are never anchors' candidate partners, in range, deterministic") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val cands = DedupQueries.queries("dedup_minhash_lsh").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val candSym = cands.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val maxDoc = graft.sources.Tables(dir).documents
      .agg(max(col("doc_id"))).head.getLong(0)
    pairs.foreach { case (anchor, pos, _, draw, neg) =>
      assert(draw >= 0 && draw < 2)
      assert(neg >= 0 && neg <= maxDoc)
      assert(neg != anchor && neg != pos)
      assert(!candSym.contains((anchor, neg)), s"negative $neg is a candidate of $anchor")
    }
    // pure function of the corpus: a second evaluation is bit-identical
    val again = DedupQueries.queries("docs_training_pairs").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))
    assert(again.sortBy(p => (p._1, p._4)).toSeq == pairs.sortBy(p => (p._1, p._4)).toSeq)
  }

  test("hard negatives: rejected, ranked, below-threshold, anchors at least as good as strict") {
    val hn = DedupQueries.queries("docs_hard_negatives").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(hn.nonEmpty, "loose retriever should surface rejected candidates at sf0.001")
    // every negative scored strictly below the dup threshold; ranks dense
    // from 1 and ordered by descending cosine within an anchor
    hn.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted(Ordering[Double].reverse).toSeq)
      assert(rows.map(_._2).distinct.length == 1, "one positive per anchor")
    }
    hn.foreach { case (anchor, pos, neg, cos, _) =>
      assert(cos < 0.8)
      assert(neg != anchor && neg != pos)
    }
    // the loose retriever subsumes the band retriever (a band match
    // implies all its component values match), so every strict anchor
    // whose positive pair the bands found is also loose-verified: if it
    // shows up here its positive cosine can only match or improve — and
    // when both retrievers agree on the best pair, the positive agrees
    val strictPos = pairs.map { case (a, p, c, _, _) => a -> ((p, c)) }.toMap
    val hnPos = hn.map { case (a, p, _, _, _) => a -> p }.toMap
    val agree = hnPos.keySet.intersect(strictPos.keySet)
      .count(a => hnPos(a) == strictPos(a)._1)
    assert(agree > 0, "retrievers should agree on at least one anchor's positive")
  }

  test("loose-candidate whale cap: drop rule matches a driver recompute, monotone, exact above max bucket") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.{words, shingles}
    graft.plans.VectorExpressions.register(spark)
    val t = graft.sources.Tables(dir)
    // the same component rows the retriever buckets on
    val sh = t.documents.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), shingles("w").as("s"))
    val comp = DedupQueries.minhashSigs(sh)
      .select(col("doc_id"), posexplode_outer(col("m")).as(Seq("comp_id", "v")))
      .select("doc_id", "comp_id", "v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def driverPairs(cap: Int): Set[(Long, Long)] =
      comp.groupBy(c => (c._2, c._3)).values
        .filter(b => b.length <= cap)
        .flatMap { b =>
          val ids = b.map(_._1).distinct.sorted
          for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
        }.toSet
    def enginePairs(cap: Int): Set[(Long, Long)] =
      DedupQueries.looseCandidatesCapped(t, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tiny = enginePairs(2)
    assert(tiny == driverPairs(2))
    val full = enginePairs(Int.MaxValue)
    assert(full == driverPairs(Int.MaxValue) && full.nonEmpty)
    assert(tiny.subsetOf(full), "capping only ever drops pairs")
    // the registered cap (64) is exact at this scale (max bucket ~6)
    assert(enginePairs(64) == full)
  }

  test("fertility: exact per-lang recompute from raw text") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = graft.sources.Tables(dir).documents
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val subRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val want = docs.groupBy(_._1).map { case (lang, rows) =>
      val ws = rows.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
      val sub = rows.map(t => subRe.findAllIn(t._2).length.toLong).sum
      lang -> ((rows.length.toLong, ws, sub, sub * 1000 / math.max(ws, 1L)))
    }
    val got = TextQueries.queries("text_fertility").fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
  }
}
