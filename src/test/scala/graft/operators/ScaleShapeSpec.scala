package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SURVEY §5 scale claims that only show up in physical plans:
  * bucketed joins avoid the exchange, salted aggregation stays correct. */
class ScaleShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed co-located join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = graft.sources.Tables(TestSpark.Sf0001)
    t.orders.select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val physical = joined.queryExecution.executedPlan.toString
    // both sides are bucketed on the join key: the join must be
    // exchange-free (this is what "pre-partitioned co-located join"
    // means at 100 TB — zero shuffle of either fact table)
    assert(!physical.contains("Exchange hashpartitioning"), physical)
    assert(joined.count() == t.lineitem.count())
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")
  }

  private def planOf(name: String): String =
    graft.SparkEntry.registry(name).fn(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString

  test("round-3 plan-shape invariants hold") {
    // CUBE/ROLLUP expand over pre-aggregated cells: Expand's input is an
    // aggregate, so the raw corpus is never inflated 2^dims times
    val cube = planOf("q_cube_agg")
    assert(cube.indexOf("Expand") < cube.indexOf("FileScan"), cube)
    assert(cube.substring(cube.indexOf("Expand")).contains("HashAggregate"), cube)
    // one-pass Q17: exactly one exchange touches lineitem (the window),
    // and the part lookup broadcasts
    val q17 = planOf("q_small_qty_revenue")
    assert(q17.contains("Window"), q17)
    assert(q17.contains("BroadcastHashJoin"), q17)
    // solo-late: the COUNT(DISTINCT) rewrite keeps Expand out of the plan
    assert(!planOf("q_solo_late_supplier").contains("Expand"))
    // retention: the distinct collapses BEFORE the cohort window
    val ret = planOf("events_retention")
    assert(ret.indexOf("Window") < ret.indexOf("FileScan"), ret)
    // LSH families run through the custom operator, never a band self-join
    Seq("dedup_minhash_lsh", "ann_lsh_cosine", "ann_lsh_multiprobe").foreach { q =>
      val p = planOf(q)
      assert(p.contains("BandedPairs"), s"$q lost the custom operator")
      assert(!p.contains("SortMergeJoin ["), s"$q band join regressed: $p")
    }
    // hourly leaderboard keeps the custom bounded-heap top-k
    assert(planOf("events_top_users_hourly").contains("PartialTopK"))
  }

  test("triangle serving plan reads only the staged apex-edge frame") {
    val opt = graft.SparkEntry.registry("graph_triangles").fn(spark, TestSpark.Sf0001)
      .queryExecution.optimizedPlan.toString
    // r14: the orientation + adjacency + intersect build runs once per
    // corpus state inside the stagedTriEdges builder (its content is
    // pinned against the inline build by StagedFramesSpec); the SERVING
    // plan must read the cached staged frame and never touch the fact
    // table — no bare lineitem relation leaf anywhere.
    assert(opt.contains("InMemoryRelation"), opt)
    assert(opt.contains("graft_gtri_"), s"triangles not reading the staged frame:\n$opt")
    assert("Relation ?\\[[^\\]]*l_orderkey".r.findFirstIn(opt).isEmpty,
      s"uncached lineitem leaf in triangle plan:\n$opt")
  }

  test("curriculum: one keyed shuffle, counts enter as broadcast literals") {
    // the global-step closed form must not reintroduce the global window
    // it exists to avoid: the corpus shuffles exactly once, keyed on
    // (phase, source), and the count/offset tables ride in as broadcast
    // literal frames (no second derivation of the corpus scan)
    val p = planOf("docs_curriculum")
    assert(!p.contains("windowspecdefinition()"), p) // no empty-partition window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"curriculum wants 1 keyed shuffle, got $exchanges:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"corpus scanned more than once in the main job:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("round-5c plan-shape invariants hold") {
    // CDC chunker: the zero-shuffle claim — no Exchange anywhere
    val cdc = planOf("docs_chunk_cdc")
    assert(!cdc.contains("Exchange"), s"cdc chunker grew a shuffle:\n$cdc")
    // sliding chunker is likewise map-side only
    assert(!planOf("docs_chunk_sliding").contains("Exchange hashpartitioning"))
    // tokenization: the vocab joins back as a BROADCAST, never a shuffle
    // of the token stream against the vocab
    val tok = planOf("docs_tokenize_ids")
    assert(tok.contains("BroadcastHashJoin"), tok)
    // SQ ANN: both top-k phases ride the bounded-heap custom operator
    val sq = planOf("ann_sq_topk")
    assert(sq.contains("PartialTopK") && sq.contains("FinalTopK"), sq)
    // pagerank: the rank join is a broadcast at this scale (AQE) and the
    // persisted edge list is read from the cache, not re-derived
    val pr = planOf("graph_pagerank")
    assert(pr.contains("InMemoryTableScan"), pr)
    // every iteration's dst exchange must sit ABOVE a partial aggregate
    // (map-side combine first: the exchange carries ≤ partitions·|V|
    // partial sums, never |E| raw messages) — pinned here because this is
    // the property that makes the per-iteration shuffle cheap, and the
    // reason a dst-prepartitioned edge cache does NOT pay (measured 15%
    // slower: AQE-cached relations hide their partitioning at planning
    // time, so the exchange stays regardless)
    val dstEx = "Exchange hashpartitioning\\(dst[^\\n]*\\n[^\\n]*HashAggregate\\(keys=\\[dst[^\\n]*partial_sum".r
    assert(dstEx.findFirstIn(pr).isDefined,
      s"iteration exchange lost its map-side partial combine:\n$pr")
    // binned range join: the exactly-once predicate rides the JOIN
    // condition (no post-join Distinct/Dedup node materializes pairs)
    val rj = planOf("events_concurrent_sessions")
    assert(!rj.contains("Deduplicate") && !rj.contains("HashAggregate(keys=[a_user"), rj)
  }

  test("saltedAgg matches the direct aggregation on a skewed dataset") {
    // whale key: 90% of rows on key 7
    val rows = (1 to 20000).map(i => (if (i % 10 != 0) 7L else i.toLong % 100, i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val got = Skew.saltedCountSum(df, Seq("k"), "v", buckets = 16)
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-6) // double sum assoc tolerance
    }
  }

  test("round-7b plan-shape invariants hold") {
    // bigram LM (re-pinned r14): the per-doc score frame comes STAGED
    // (stagedDocPred) — the serving plan reads the cached staged frame
    // and never re-runs the corpus bigram explode (no generator over the
    // documents scan); the old pin asserted the inline three-consumer
    // materialization that now lives in the stage builder
    val lm = planOf("text_bigram_lm")
    assert("InMemoryTableScan".r.findAllIn(lm).size >= 1, lm)
    assert(!lm.contains("Generate"), lm)
    // heavy hitters: count table cached (totals re-aggregate the cache),
    // totals broadcast back with the multiplied-through threshold
    val hh = planOf("events_heavy_hitters")
    assert("InMemoryTableScan".r.findAllIn(hh).size >= 2, hh)
    assert(hh.contains("BroadcastHashJoin"), hh)
    // grouping sets: Expand sits above the pre-aggregated cells, never
    // the raw fact scan (the cube pin, for the general form)
    val gs = planOf("q_grouping_sets")
    assert(gs.indexOf("Expand") < gs.indexOf("FileScan"), gs)
    // Pareto frontier: the sweep window consumes the per-date cell
    // AGGREGATE (cells-first — an aggregate sits below the window in the
    // broadcast subtree), and the surviving cells re-enter broadcast
    val pf = planOf("q_pareto_frontier")
    assert(pf.contains("BroadcastHashJoin"), pf)
    val win = pf.indexOf("Window")
    assert(win >= 0 && pf.substring(win).contains("HashAggregate"), pf)
  }

  test("round-7c plan-shape invariants hold") {
    // split assignment is pure map-side: a single stage, no exchange of
    // any kind (content hash + integer mix per row)
    val asg = planOf("docs_split_assign")
    assert(!asg.contains("Exchange"), asg)
    // exact all-pairs join: candidates come from the custom
    // bucket-clustered operator, never a token self-join; the shingle
    // table is materialized once and both branches read the cache
    val ap = planOf("dedup_allpairs_jaccard")
    assert(ap.contains("BandedPairs"), ap)
    assert(!ap.contains("SortMergeJoin ["), ap)
    assert("InMemoryTableScan".r.findAllIn(ap).size >= 2, ap)
    // leakage reuses the LSH band operator (same candidate set as dedup)
    val lk = planOf("docs_split_leakage")
    assert(lk.contains("BandedPairs"), lk)
  }
}
