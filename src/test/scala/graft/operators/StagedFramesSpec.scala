package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r12 — direct pins for the staged-derived-frame equalities the graph
  * rewiring and the minhash-signature staging rely on. The oracles prove
  * them indirectly (every consumer stayed hash-green); these make the
  * claims checkable without DuckDB in the loop. */
class StagedFramesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("symFromAdj equals the union-built symmetric edge list") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val e = GraphQueries.stagedEdges(spark, sf)
    val want = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(e.select(col("pb").as("src"), col("pa").as("dst")))
      .orderBy("src", "dst").collect().map(_.toSeq).toSeq
    val got = GraphQueries.symFromAdj(GraphQueries.stagedAdj(spark, sf))
      .orderBy("src", "dst").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("degFromAdj equals the explode-groupBy degree table") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val e = GraphQueries.stagedEdges(spark, sf)
    val want = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .orderBy("node").collect().map(_.toSeq).toSeq
    val got = GraphQueries.degFromAdj(GraphQueries.stagedAdj(spark, sf))
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged adjacency arrays are sorted-distinct (the consumers' cap/slice contract)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val bad = GraphQueries.stagedAdj(spark, sf)
      .where(expr("ns <> array_sort(array_distinct(ns))"))
      .count()
    assert(bad == 0L)
  }

  test("staged wedge pairs serve jaccard and RA exactly (staged ≡ inline)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // the staged frame's common-count column reproduces the inline capped
    // wedge build (cap 24 is the family constant both consumers used)
    val gotJ = GraphQueries.jaccardNeighbors(spark, sf)
      .orderBy("node", "rank").collect().map(_.toSeq).toSeq
    val wantJ = GraphQueries.jaccardNeighborsCapped(spark, sf, 24)
      .orderBy("node", "rank").collect().map(_.toSeq).toSeq
    assert(gotJ == wantJ && gotJ.nonEmpty)
    // and the ra_nano column is the inline weighted-vote sum
    val adj = GraphQueries.stagedAdj(spark, sf)
    val wantRa = adj.select(
        expr("1000000000 div size(ns)").cast("long").as("w"),
        slice(col("ns"), 1, 24).as("ns"))
      .select(col("w"), explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns) - i - 1), y -> x * 4294967296L + y)))")).as("ab"))
      .groupBy("ab")
      .agg(count(lit(1)).as("common"), sum(col("w")).as("ra_nano"))
      .orderBy("ab").collect().map(_.toSeq).toSeq
    val gotRa = GraphQueries.stagedWedgePairs(spark, sf)
      .orderBy("ab").collect().map(_.toSeq).toSeq
    assert(gotRa == wantRa && gotRa.nonEmpty)
  }

  test("bitmask closeness equals the pair-state BFS") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions.{col, md5, lit, count, sum, expr}
    graft.plans.VectorExpressions.register(spark)
    val adj = GraphQueries.stagedAdj(spark, sf)
    val sym = GraphQueries.symFromAdj(adj)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = adj.select(col("node"))
      .withColumn("hx", graft.plans.VectorExpressions.hexPrefix(
        md5(col("node").cast("string")), 8))
      .orderBy(col("hx"), col("node")).limit(32)
      .select(col("node").as("seed"), col("node"))
    var visited = seeds.withColumn("hop", lit(0)).localCheckpoint(true)
    var frontier = visited.select("seed", "node")
    for (k <- 1 to 3) {
      val next = sym.join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(visited, Seq("seed", "node"), "left_anti")
        .localCheckpoint(true)
      visited = visited.unionByName(next.withColumn("hop", lit(k)))
      frontier = next.select("seed", "node")
    }
    val want = visited.groupBy("seed").agg(
        count(lit(1)).as("n_reached"),
        sum(col("hop")).as("sum_dist"),
        sum(expr("CASE WHEN hop > 0 THEN 1000000 div hop ELSE 0L END")).as("harmonic_ppm"))
      .orderBy("seed").collect().map(_.toSeq).toSeq
    sym.unpersist()
    val got = GraphQueries.closeness(spark, sf)
      .orderBy("seed").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged scored candidate pairs equal an inline scorePairs run") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = graft.sources.Tables(sf)
    def inline(cands: org.apache.spark.sql.DataFrame) = {
      val c = cands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = DedupQueries.scorePairs(t, c)
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
      c.unpersist(); r
    }
    val gotBand = DedupQueries.stagedBandScored(spark, sf)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(gotBand == inline(DedupQueries.minhashLsh(spark, sf)) && gotBand.nonEmpty)
    val gotLoose = DedupQueries.stagedLooseScored(spark, sf)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(gotLoose == inline(DedupQueries.looseCandidatesCapped(t, 24)) && gotLoose.nonEmpty)
  }

  test("staged per-doc LM scores equal the inline docPred build") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = TextIndexQueries.stagedDocPred(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = TextIndexQueries.docPred(graft.sources.Tables(sf).documents)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged stay-pair table equals an inline overlappingStays run") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = MultiIntervalJoin.stagedStayPairs(spark, sf)
      .orderBy("a_user", "b_user").collect().map(_.toSeq).toSeq
    val want = MultiIntervalJoin.overlappingStays(spark, sf)
      .orderBy("a_user", "b_user").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged term weights equal the inline tf/df/N build") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = graft.sources.Tables(sf)
    val sh = t.documents
      .withColumn("w", graft.functions.TextFunctions.words(col("text")))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles("w")).as("term"))
    val tfAll = sh.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfx = tfAll.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = t.documents.agg(count(lit(1)).as("n_docs"))
    val want = tfAll.join(dfx, Seq("term")).crossJoin(nDocs)
      .select(col("doc_id"), col("term"),
        expr("tf * ((100 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1))").as("wgt"))
      .orderBy("doc_id", "term").collect().map(_.toSeq).toSeq
    val got = DedupQueries.stagedTermWeights(spark, sf)
      .select("doc_id", "term", "wgt")
      .orderBy("doc_id", "term").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("source-overlap fold is associative over batch splits and equals the batch matrix") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val docs = DedupQueries.stagedSourceShingles(spark, sf)
    val bucket = graft.plans.VectorExpressions.hexPrefix(md5(col("doc_id").cast("string")), 8) % 100
    def cellsOf(cond: org.apache.spark.sql.Column) = docs.where(cond)
      .select(col("source"), explode(col("hs")).as("shg")).distinct()
    // doc-split batches: their cell sets OVERLAP (same (source, shg) can
    // arrive in both), exercising the fold's already-present dedup
    val all = cellsOf(lit(true))
    val b1 = cellsOf(bucket < 50)
    val b2 = cellsOf(bucket >= 50)
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src_a", "src_b").collect().map(_.toSeq).toSeq
    val oneShot = sortedRows(DedupQueries.sourceOverlapMatrix(
      DedupQueries.sourceOverlapFold(DedupQueries.emptyOverlapState, all)))
    val twoStep = sortedRows(DedupQueries.sourceOverlapMatrix(
      DedupQueries.sourceOverlapFold(
        DedupQueries.sourceOverlapFold(DedupQueries.emptyOverlapState, b1), b2)))
    val batch = sortedRows(DedupQueries.sourceOverlap(spark, sf))
    assert(oneShot == batch && oneShot.nonEmpty)
    assert(twoStep == batch)
  }

  test("staged apex-edge triangle frame equals the inline orientation + intersect") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val e = GraphQueries.stagedEdges(spark, sf)
    val deg = GraphQueries.degFromAdj(GraphQueries.stagedAdj(spark, sf))
    val withDeg = e
      .join(deg.toDF("pa", "deg_a"), Seq("pa"))
      .join(deg.toDF("pb", "deg_b"), Seq("pb"))
    val oriented = withDeg.select(
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pa"))
        .otherwise(col("pb")).as("src"),
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pb"))
        .otherwise(col("pa")).as("dst"))
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
    val want = oriented
      .join(adj.toDF("src", "ns_a"), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("ns").as("ns_b")), Seq("dst"))
      .select(col("src"), col("dst"),
        expr("array_sort(array_intersect(ns_a, ns_b))").as("tris"))
      .where(size(col("tris")) > 0)
      .orderBy("src", "dst").collect().map(_.toSeq).toSeq
    val got = GraphQueries.stagedTriEdges(spark, sf)
      .select(col("src"), col("dst"), expr("array_sort(tris)").as("tris"))
      .orderBy("src", "dst").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged fact value-counts equal the inline melt aggregate") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val want = graft.sources.Tables(sf).lineitem
      .select(explode_outer(array(cols.map(c =>
        struct(lit(c).as("k"), col(c).cast("string").as("v"))): _*)).as("a"))
      .groupBy(col("a.k").as("col_name"), col("a.v").as("val"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("col_name", "val").collect().map(_.toSeq).toSeq
    val got = StorageQueries.stagedValCounts(spark, sf)
      .orderBy("col_name", "val").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("archive cells + batch cells merge by cnt-sum to the full cell frame") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val li = graft.sources.Tables(sf).lineitem
    val bucket = graft.plans.VectorExpressions
      .hexPrefix(md5(col("l_orderkey").cast("string")), 8) % 100
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(explode_outer(array(cols.map(c =>
        struct(lit(c).as("k"), col(c).cast("string").as("v"))): _*)).as("a"))
      .groupBy(col("a.k").as("col_name"), col("a.v").as("val"))
      .agg(count(lit(1)).as("cnt"))
    // both splits are non-empty at sf0.001, so the merge is exercised
    assert(li.where(bucket < 80).count() > 0 && li.where(bucket >= 80).count() > 0)
    val merged = cells(li.where(bucket < 80)).unionByName(cells(li.where(bucket >= 80)))
      .groupBy("col_name", "val").agg(sum(col("cnt")).as("cnt"))
      .orderBy("col_name", "val").collect().map(_.toSeq).toSeq
    val full = StorageQueries.stagedValCounts(spark, sf)
      .orderBy("col_name", "val").collect().map(_.toSeq).toSeq
    assert(merged == full && merged.nonEmpty)
  }

  test("staged o_custkey counts equal the inline orders aggregate") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val want = graft.sources.Tables(sf).orders
      .groupBy(lit("o_custkey").as("col_name"), col("o_custkey").cast("string").as("val"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("val").collect().map(_.toSeq).toSeq
    val got = StorageQueries.stagedCustKeyCounts(spark, sf)
      .orderBy("val").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged-signature candidate pairs equal the from-scratch lshPairsOf pipeline") {
    // pins the r14 substitution in splitLeakage / splitScrub /
    // crossSourceMatrix (and pipelineReport before them): over the
    // registered corpus at the registered 3-gram convention, the
    // staged-signature path emits the identical candidate pair set
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val got = DedupQueries.minhashLsh(spark, sf)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val want = DedupQueries.lshPairsOf(graft.sources.Tables(sf).documents)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged span-hash frame equals the inline stride-1 explode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = CorpusQueries.stagedSpans(spark, sf)
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    val want = CorpusQueries.spansOf(graft.sources.Tables(sf).documents)
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("scrub's in-row interval mask equals the covered-position explode form") {
    // pins the r15 rewrite: reconstructing the covered set per doc from
    // the sorted non-first span STARTS (i ∈ ∪[p, p+29]) produces the same
    // (n_scrubbed, scrubbed_hash) as the old explode-to-positions +
    // corpus-wide distinct + collect_set formulation
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val W = 30
    val toks = graft.sources.Tables(sf).documents
      .select(col("doc_id"), graft.functions.TextFunctions.words(col("text")).as("w"))
      .where(size(col("w")) > 0)
    val spans = CorpusQueries.stagedSpans(spark, sf)
      .select(col("doc_id"), col("pos"), col("span_hash").as("h"))
    val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val covered = spans
      .withColumn("multi", min(col("doc_id")).over(wH) =!= max(col("doc_id")).over(wH))
      .withColumn("first", min(struct(col("doc_id"), col("pos"))).over(wH))
      .where(col("multi") &&
        !(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (W - 1))).as("cpos"))
      .distinct()
    val cuts = covered.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("cpos"))).as("cut"))
    val want = toks.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cut")), lit(0)).cast("long").as("n_scrubbed"),
        md5(concat_ws(" ", expr(
          "transform(filter(sequence(1, size(w)), i -> cut IS NULL OR NOT array_contains(cut, i)), i -> element_at(w, i))")))
          .as("scrubbed_hash"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val got = CorpusQueries.scrubSpans(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
    assert(want.exists(r => r(2).asInstanceOf[Long] > 0L)) // scrubbing actually fires
  }

  test("staged string shingle sets equal the inline words->shingles build") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = DedupQueries.stagedShingleSets(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    val want = graft.sources.Tables(sf).documents
      .withColumn("w", graft.functions.TextFunctions.words(col("text")))
      .withColumn("s", graft.functions.TextFunctions.shingles("w"))
      .select(col("doc_id"), array_distinct(col("s")).as("ss"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged doc tokens equal the inline words(text) build") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val got = TextQueries.stagedDocTokens(spark, sf)
      .select("doc_id", "lang", "source", "n_chars", "w")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getSeq[String](4))).toSeq
    val want = graft.sources.Tables(sf).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getSeq[String](4))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("staged minhash signatures equal an in-query recompute") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    val got = DedupQueries.stagedSigs(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val want = DedupQueries.minhashSigs(
        graft.sources.Tables(sf).documents
          .withColumn("w", graft.functions.TextFunctions.words(col("text")))
          .withColumn("s", graft.functions.TextFunctions.shingles("w"))
          .select("doc_id", "s"))
      .select("doc_id", "m")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
