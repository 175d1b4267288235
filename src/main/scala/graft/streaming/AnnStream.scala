package graft.streaming

import scala.collection.mutable

import graft.operators.AnnQueries
import graft.plans.VectorExpressions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One streamed similarity probe. */
final case class Probe(probe_id: Long, embedding: Array[Float])

/** One emitted neighbor. */
final case class Hit(probe_id: Long, rank: Long, vec_id: Long, cos: Double)

/** One scored candidate (internal shuffle row of the exact path). */
final case class Scored(probe_id: Long, vec_id: Long, cos: Double)

/** One ADC candidate (internal shuffle row of the served path). */
final case class AdcCand(probe_id: Long, p_emb: Array[Float], p_norm: Double,
                         vec_id: Long, approx: Double)

/** One shortlist member awaiting exact re-rank (served path). */
final case class ShortCand(probe_id: Long, vec_id: Long,
                           p_emb: Array[Float], p_norm: Double)

/** One hybrid candidate (internal shuffle row: dense row with its cosine,
  * or a lexical-list row with cos = -2 sentinel). */
final case class HybridCand(probe_id: Long, doc_id: Long, cos: Double, rank_lex: Int)

/** One fused hybrid result (the batch `text_hybrid_rrf` row shape plus
  * the probe id). */
final case class HybridHit(probe_id: Long, doc_id: Long, rank_lex: Int,
                           rank_vec: Int, rrf: Long)

/** Streaming ANN (SURVEY §8 candidate (c)): a probe stream searched
  * against a STATIC corpus-side table via stream-static joins — the
  * corpus never leaves the executors. Two serving shapes:
  *
  *  - [[topK]] — the EXACT baseline: probes stream-static-join the raw
  *    embedding table (the same cross-join-shaped candidate plan as the
  *    batch `ann_bruteforce_topk`); cost is O(corpus) per probe by
  *    definition of exact search, but the work is distributed — nothing
  *    O(corpus) ever reaches the driver.
  *  - [[servedTopK]] — the DEPLOYMENT shape: probes search the persisted
  *    IVF-PQ code corpus ([[AnnQueries.ivfPqServedIndex]]). Only the
  *    recipe (ncentroids centroid vectors + m·k PQ codewords) is embedded
  *    in the plan as literals — the genuinely bounded structures; the
  *    coded corpus stays a static parquet scan joined per micro-batch on
  *    the probed clusters, and raw floats are touched only by the
  *    per-probe shortlist re-rank. This is the same economics as the
  *    batch `ann_ivfpq_served`, which the spec pins row-for-row.
  *
  * Per-probe top-k selection is a stateful op in a stream; both shapes
  * use append-mode flatMapGroupsWithState with a bounded heap (ranking
  * (score DESC, vec_id ASC) — [[graft.plans.TopKPerKey]]'s exact
  * semantics) and never set state: each probe row arrives in exactly one
  * micro-batch, and a stream-static join emits that probe's complete
  * candidate set within the same micro-batch, so the group fires once
  * with everything it needs. Column expressions (codegen'd dot/cosine,
  * HALF_UP round to 6) are shared with the batch queries, so streamed
  * hits are row-identical to their batch twins.
  */
object AnnStream {

  /** Exact top-k: probes vs the raw embedding table (static side).
    * Row-identical to `ann_bruteforce_topk` — same candidate expressions
    * ([[AnnQueries]] `scoredProbes`), same ranking. Works on batch
    * Datasets through the same code path (flatMapGroupsWithState
    * degrades to flatMapGroups in batch execution). */
  def topK(probes: Dataset[Probe], corpus: DataFrame, k: Int): Dataset[Hit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val corpusN = corpus.select(col("vec_id"), col("embedding"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("c_norm"))
    val p = probes.toDF().select(col("probe_id"), col("embedding").as("p_emb"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("p_norm"))
    val cands = p.join(corpusN, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorExpressions.dot(col("embedding"), col("p_emb"))
          / (col("c_norm") * col("p_norm")), 6).as("cos"))
      .as[Scored]
    topKPerProbe(cands, k)
  }

  /** Served top-k from the persisted IVF-PQ index: ADC candidates from
    * the coded corpus (stream-static join on the probed clusters), a
    * bounded shortlist per probe, then exact cosine re-rank against the
    * raw embeddings for shortlist members only. `cents`/`cb` are the
    * persisted recipe ([[AnnQueries.readCentroids]]/`readCodebook`) —
    * the only structures that leave the executors. Row-identical to
    * `ann_ivfpq_served` by construction (same recipe, same expressions,
    * same shortlist width and ranking). */
  def servedTopK(probes: Dataset[Probe], corpus: DataFrame, codes: DataFrame,
                 cents: Seq[Array[Float]], cb: Array[Array[Array[Float]]],
                 k: Int): Dataset[Hit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val cands = AnnQueries.ivfPqCandidateFrame(probes.toDF(), codes, cents, cb).as[AdcCand]
    val short = cands.groupByKey(_.probe_id)
      .flatMapGroupsWithState[Boolean, ShortCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (pid: Long, rows: Iterator[AdcCand], _: GroupState[Boolean]) =>
          var pEmb: Array[Float] = null
          var pNorm = 0.0
          val kept = heapSelect(rows.map { c =>
            if (pEmb == null) { pEmb = c.p_emb; pNorm = c.p_norm }
            (c.approx, c.vec_id)
          }, AnnQueries.pqShortlistSize)
          kept.iterator.map { case (_, id) => ShortCand(pid, id, pEmb, pNorm) }
      }
    val corpusN = corpus.select(col("vec_id"), col("embedding").as("c_emb"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("c_norm"))
    val exact = short.join(corpusN, Seq("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorExpressions.dot(col("c_emb"), col("p_emb"))
          / (col("c_norm") * col("p_norm")), 6).as("cos"))
      .as[Scored]
    topKPerProbe(exact, k)
  }

  /** §8s(dv) — streaming CROSS-MODAL retrieval: streamed TEXT probes
    * search the static image/audio side of the shared space through the
    * seed-centroid IVF tower (stream-static join on the probed
    * clusters) — the serving shape of the batch `mm_ann_crossmodal`,
    * which the spec pins row-for-row on the family probe set. Only the
    * bounded centroid recipe ([[AnnQueries.seedCentroids]]) is embedded
    * in the plan; the non-text corpus side stays a static scan. */
  def crossModalTopK(probes: Dataset[Probe], corpus: DataFrame,
                     cents: Seq[Array[Float]], k: Int): Dataset[Hit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val cands = AnnQueries.crossModalCandidateFrame(
      probes.toDF(), corpus, cents, broadcastProbes = false).as[Scored]
    topKPerProbe(cands, k)
  }

  /** r11 — streaming twin of `ann_ivf_topk_twolevel`: arriving probes
    * navigate the STATIC archive through the beyond-cap two-level tower
    * (the single-pass `graft_twolevel_assign`/`_probe` kernels; only the
    * bounded centroid recipe is embedded in the plan) via a
    * stream-static join on the probed cells. Candidate expressions are
    * shared verbatim with the batch query
    * ([[AnnQueries.twoLevelCandidateFrame]]), so streamed hits are
    * row-identical to their batch twins — the spec pins it. */
  def twoLevelTopK(probes: Dataset[Probe], corpus: DataFrame,
                   cents: Seq[Array[Float]], k: Int): Dataset[Hit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val cands = AnnQueries.twoLevelCandidateFrame(
      probes.toDF(), corpus, cents, broadcastProbes = false).as[Scored]
    topKPerProbe(cands, k)
  }

  /** r11 — streaming twin of `ann_matryoshka_refine` (MRL truncate-then-
    * refine): arriving probes rank the STATIC corpus by the d/4 PREFIX
    * cosine (stream-static join; the corpus-width pass runs at a quarter
    * of the flops, and against a materialized prefix column would read a
    * quarter of the bytes), a bounded per-probe shortlist of
    * [[AnnQueries.MrlCandK]] candidates survives, and only those re-rank
    * at full dimension against the raw embedding table — the
    * [[servedTopK]] economics with the prefix cosine in place of the ADC
    * approximation. Candidate expressions are shared verbatim with the
    * batch query ([[AnnQueries.mrlCandidateFrame]]), so streamed hits
    * are row-identical to their batch twins — the spec pins it. */
  def matryoshkaTopK(probes: Dataset[Probe], corpus: DataFrame, k: Int): Dataset[Hit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val cands = AnnQueries.mrlCandidateFrame(
      probes.toDF().select(col("probe_id"), col("embedding")), corpus,
      broadcastProbes = false).as[AdcCand]
    val short = cands.groupByKey(_.probe_id)
      .flatMapGroupsWithState[Boolean, ShortCand](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (pid: Long, rows: Iterator[AdcCand], _: GroupState[Boolean]) =>
          var pEmb: Array[Float] = null
          var pNorm = 0.0
          val kept = heapSelect(rows.map { c =>
            if (pEmb == null) { pEmb = c.p_emb; pNorm = c.p_norm }
            (c.approx, c.vec_id)
          }, AnnQueries.MrlCandK)
          kept.iterator.map { case (_, id) => ShortCand(pid, id, pEmb, pNorm) }
      }
    val corpusN = corpus.select(col("vec_id"), col("embedding").as("c_emb"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("c_norm"))
    val exact = short.join(corpusN, Seq("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        round(VectorExpressions.dot(col("c_emb"), col("p_emb"))
          / (col("c_norm") * col("p_norm")), 6).as("cos"))
      .as[Scored]
    topKPerProbe(exact, k)
  }

  /** Per-probe ranked top-k over scored candidates — the streaming
    * counterpart of [[graft.operators.TopK.perKeyExec]], same bounded
    * heap, same (score DESC, vec_id ASC) ranking. */
  /** §8k(bl) — streaming HYBRID retrieval: each streamed probe is served
    * the RRF fusion of (a) its dense cosine top-`depth` against the
    * static corpus and (b) the STATIC lexical list (BM25 top-`depth`,
    * `(doc_id, rank_lex)` — corpus-derived, probe-independent for the
    * pinned query terms, broadcast per micro-batch). The two-tower
    * deployment shape end-to-end: dense candidates stream-static join
    * the embedding table, the lexical tower rides a broadcast, and ONE
    * stateless-state group fold per probe does dense ranking (bounded
    * heap), fusion (the batch `text_hybrid_rrf` integer surrogate
    * 10⁹ div (rrfK + rank)), and final top-`k` — no second stateful
    * operator, because the stream-static joins deliver a probe's entire
    * candidate set inside its one micro-batch.
    *
    * Memory per group: the `depth`-bounded heap + the ≤`depth`-row
    * lexical list — never O(corpus). The spec pins the output
    * row-for-row to the batch `text_hybrid_rrf` fusion for the same
    * probe. */
  def hybridTopK(probes: Dataset[Probe], corpus: DataFrame, lex: DataFrame,
                 depth: Int = 100, k: Int = 20, rrfK: Int = 60): Dataset[HybridHit] = {
    val spark = probes.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val corpusN = corpus.select(col("vec_id"), col("embedding"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("c_norm"))
    val p = probes.toDF().select(col("probe_id"), col("embedding").as("p_emb"),
      sqrt(VectorExpressions.dot(col("embedding"), col("embedding"))).as("p_norm"))
    val dense = p.join(corpusN, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("doc_id"),
        round(VectorExpressions.dot(col("embedding"), col("p_emb"))
          / (col("c_norm") * col("p_norm")), 6).as("cos"),
        lit(0).as("rank_lex"))
    // lexical tower: per-probe copy of the ≤depth-row static list
    // (cos = -2 sentinel sorts below any real cosine and marks lex-only rows)
    val lexSide = p.select(col("probe_id"))
      .crossJoin(broadcast(lex.select(col("doc_id"), col("rank_lex"))))
      .select(col("probe_id"), col("doc_id"), lit(-2.0).as("cos"), col("rank_lex"))
    def f(r: Int): Long = if (r > 0) 1000000000L / (rrfK + r) else 0L
    dense.unionByName(lexSide).as[HybridCand]
      .groupByKey(_.probe_id)
      .flatMapGroupsWithState[Boolean, HybridHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (pid: Long, rows: Iterator[HybridCand], _: GroupState[Boolean]) =>
          val lexRanks = mutable.Map.empty[Long, Int]
          val denseRows = rows.flatMap { r =>
            if (r.rank_lex > 0) { lexRanks(r.doc_id) = r.rank_lex; None }
            else Some((r.cos, r.doc_id))
          }
          val denseRanks = heapSelect(denseRows, depth)
            .iterator.zipWithIndex.map { case ((_, id), i) => id -> (i + 1) }.toMap
          (denseRanks.keySet ++ lexRanks.keySet).toSeq
            .map { d =>
              val (rl, rv) = (lexRanks.getOrElse(d, 0), denseRanks.getOrElse(d, 0))
              HybridHit(pid, d, rl, rv, f(rl) + f(rv))
            }
            .sortBy(h => (-h.rrf, h.doc_id)).take(k).iterator
      }
  }

  private def topKPerProbe(cands: Dataset[Scored], k: Int): Dataset[Hit] = {
    import cands.sparkSession.implicits._
    cands.groupByKey(_.probe_id)
      .flatMapGroupsWithState[Boolean, Hit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (pid: Long, rows: Iterator[Scored], _: GroupState[Boolean]) =>
          heapSelect(rows.map(c => (c.cos, c.vec_id)), k)
            .iterator.zipWithIndex.map { case ((cos, id), i) =>
              Hit(pid, (i + 1).toLong, id, cos)
            }
      }
  }

  /** Bounded-heap selection of the best `k` (score DESC, id ASC) entries,
    * returned best-first — [[graft.plans.TopKHeap]]'s exact semantics
    * (worst entry dequeued first: lowest score, then highest id). */
  private def heapSelect(rows: Iterator[(Double, Long)], k: Int): Seq[(Double, Long)] = {
    val worstFirst = Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
    val heap = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
    rows.foreach { e =>
      if (heap.size < k) heap.enqueue(e)
      else if (worstFirst.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
    }
    heap.dequeueAll.reverse
  }
}
