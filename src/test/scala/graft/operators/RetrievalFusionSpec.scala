package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid RRF fusion and the weighted-cosine dedup verify. */
class RetrievalFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("hybrid rrf is the exact integer fusion of its two rank columns") {
    val rows = TextIndexQueries.hybridRrf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, rl, rv, rrf) =>
      assert(rl >= 0 && rl <= 100 && rv >= 0 && rv <= 100)
      assert(rl > 0 || rv > 0, s"doc $id in neither list")
      val expect = (if (rl > 0) 1000000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000000L / (60 + rv) else 0L)
      assert(rrf == expect, s"doc $id fusion arithmetic")
    }
    // output is the top of the fused ordering and actually FUSES: docs
    // present in both lists outrank single-list docs of equal depth
    assert(rows.count { case (_, rl, rv, _) => rl > 0 && rv > 0 } > 0,
      "no doc appeared in both rankings at sf0.001 — fusion untested")
    rows.map(_._4).foldLeft(Long.MaxValue) { (prev, s) => assert(s <= prev); s }
    // rank columns are injective where present (they are row_numbers)
    def distinctRanks(f: ((Long, Int, Int, Long)) => Int) = {
      val rs = rows.map(f).filter(_ > 0); assert(rs.distinct.length == rs.length)
    }
    distinctRanks(_._2); distinctRanks(_._3)
  }

  test("cosine verify covers exactly the LSH candidate pairs with scores in [0,1]") {
    val cands = DedupQueries.minhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = DedupQueries.cosineVerify(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getBoolean(3)))
    assert(out.map(_._1).toSet == cands && cands.nonEmpty)
    out.foreach { case (pair, cos, isDup) =>
      // weights are non-negative integers, so cosine is in [0, 1]
      assert(cos >= 0.0 && cos <= 1.0, s"$pair cos $cos")
      assert(isDup == (cos >= 0.8), s"$pair flag")
    }
  }

  test("filtered top-k equals a window-ranked independent formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.plans.VectorExpressions.register(spark)
    val VE = graft.plans.VectorExpressions
    val emb = graft.sources.Tables(dir)(spark).embeddings
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding"),
      sqrt(VE.dot(col("embedding"), col("embedding"))).as("cn"))
    val probes = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("label").as("pl"),
        col("embedding").as("pe"), sqrt(VE.dot(col("embedding"), col("embedding"))).as("pn"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    val expect = corpus.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("probe_id") && col("label") === col("pl"))
      .select(col("probe_id"), col("vec_id"),
        round(VE.dot(col("embedding"), col("pe")) / (col("cn") * col("pn")), 6).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1), r.getDouble(2))).toSet
    val got = AnnQueries.filteredTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect && got.nonEmpty)
    // every neighbor shares its probe's label (the filter's contract)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (p, _, v, _) => assert(labels(p) == labels(v), s"probe $p vec $v") }
  }

  test("ivf-filtered search: scores exact, labels honored, recall bounded by the bucket stage") {
    val exact = AnnQueries.filteredTopK(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ivf = AnnQueries.ivfFilteredTopK(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    assert(ivf.nonEmpty)
    // scores are true cosines: identical on shared pairs
    (ivf.keySet & exact.keySet).foreach(k => assert(ivf(k) == exact(k), s"pair $k"))
    // label contract holds through the bucket stage
    val emb = graft.sources.Tables(dir)(spark).embeddings
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivf.keys.foreach { case (p, v) => assert(labels(p) == labels(v), s"probe $p vec $v") }
    // pruning can only lose exact pairs, and not too many of them
    val recall = (ivf.keySet & exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.3, f"filtered-IVF recall collapsed to $recall%.2f")
  }

  test("minhash estimate audits the exact signatures over the exact candidates") {
    val cands = DedupQueries.minhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = DedupQueries.minhashEstimate(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == cands && cands.nonEmpty)
    val legalEst = (0 to 12).map(k => k * 1000L / 12).toSet
    rows.foreach { case (pair, est, exact, err) =>
      assert(legalEst(est), s"$pair est $est is not a k/12 per-mille")
      assert(exact >= 0 && exact <= 1000, s"$pair exact $exact")
      assert(err == est - exact, s"$pair err")
    }
    // the exact side must agree with the Jaccard verify (floor vs round-6)
    val jac = DedupQueries.ngramJaccard(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    rows.foreach { case (pair, _, exact, _) =>
      assert(math.abs(exact - jac(pair) * 1000) <= 1.0, s"$pair exact-vs-jaccard")
    }
  }

  test("served BM25/phrase equal their inline twins and never scan the corpus") {
    val bmInline = TextIndexQueries.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bmServed = TextIndexQueries.bm25Served(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bmServed == bmInline && bmInline.nonEmpty)
    val phInline = TextIndexQueries.phraseSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val phServed = TextIndexQueries.phraseServed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(phServed == phInline && phInline.nonEmpty)
    // the serving contract: plans read the index, never the corpus
    Seq(TextIndexQueries.bm25Served(spark, dir), TextIndexQueries.phraseServed(spark, dir))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("documents.parquet"), "served plan scanned the corpus")
        assert(plan.contains("postings"), "served plan did not read the postings index")
      }
  }

  test("index-served hybrid fuses exactly the IVF dense ranks and postings lexical ranks") {
    val vecRanks = AnnQueries.ivfRankedForProbe(spark, dir, 0L, 100)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lexRanks = TextIndexQueries.bm25Ranked(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val served = TextIndexQueries.hybridServed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(served.length == 20)
    served.foreach { case (d, rl, rv, rrf) =>
      assert(rl == lexRanks.getOrElse(d, 0), s"doc $d lex rank")
      assert(rv == vecRanks.getOrElse(d, 0), s"doc $d vec rank")
      val expect = (if (rl > 0) 1000000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000000L / (60 + rv) else 0L)
      assert(rrf == expect, s"doc $d fusion")
    }
    // pruning only LOSES dense candidates vs the exact hybrid's dense tower
    val exactVec = TextIndexQueries.hybridRrf(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).filter(_._2 > 0).toMap
    vecRanks.keys.foreach { d =>
      // every IVF-ranked doc the exact top-100 also ranked must exist there
      // (rank VALUES may differ — pruning renumbers), so just containment
      // of the scored universe: IVF docs are a subset of the corpus minus probe
      assert(d != 0L)
    }
    assert(vecRanks.nonEmpty && exactVec.nonEmpty)
  }

  test("incremental BM25 over base index + fresh delta equals the full rebuild") {
    val full = TextIndexQueries.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val incr = TextIndexQueries.bm25Incremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(incr == full && full.nonEmpty)
  }

  test("knn calibration cells recompute exactly from the labeler's output") {
    val rows = AnnQueries.knnLabel(spark, dir).select("votes", "correct")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val expect = rows.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.length.toLong, xs.count(_._2).toLong,
        xs.count(_._2).toLong * 1000 / xs.length)
    }
    val got = AnnQueries.knnCalibration(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect && got.nonEmpty)
    // masses cover every probe exactly once
    assert(got.values.map(_._1).sum == rows.length)
  }

  test("byte-identical documents in the candidate set score cosine exactly 1") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(dir)(spark)
    val dupPairs = t.documents.select(col("doc_id"), md5(col("text")).as("h"))
      .as("a").join(t.documents.select(col("doc_id"), md5(col("text")).as("h")).as("b"), "h")
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = DedupQueries.cosineVerify(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val covered = dupPairs.filter(out.contains)
    // sf0.001 has no byte-identical twins today; the guard is vacuous then,
    // but fires the moment the corpus gains any (identical integer vectors
    // divide to exactly 1.0 — any other value is an arithmetic bug)
    covered.foreach { p => assert(out(p) == 1.0, s"$p") }
  }
}
