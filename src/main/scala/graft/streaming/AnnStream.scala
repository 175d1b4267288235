package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset}

/** One streamed similarity probe. */
final case class Probe(probe_id: Long, embedding: Array[Float])

/** One emitted neighbor. */
final case class Hit(probe_id: Long, rank: Long, vec_id: Long, cos: Double)

/** Streaming ANN (SURVEY §8 candidate (c)): a probe stream searched
  * against a broadcast corpus snapshot.
  *
  * The corpus snapshot is the bounded driver-side structure (same class
  * as IVF centroids / codebooks per SURVEY §5) — the pattern fits the
  * "index built offline, probes arrive as a stream" serving shape. Each
  * probe is independent, so the transform is a stateless per-row flatMap:
  * no watermark, no state store, append-mode output, and the stream
  * parallelizes by repartitioning probes across executors (each holds the
  * read-only snapshot once via the broadcast).
  *
  * Scoring reproduces the batch [[graft.operators.AnnQueries]] exactly:
  * the same sequential-double dot product as the codegen'd
  * [[graft.plans.DotProduct]], norms precomputed once per corpus row, and
  * the same HALF_UP rounding to 6 digits — so the streamed hits are
  * row-identical to `ann_bruteforce_topk`, which the spec pins.
  */
object AnnStream {

  /** (vec_id, embedding, norm) rows of the snapshot, norm = sqrt(x·x) in
    * the same accumulation order as the batch plan. */
  def corpusSnapshot(corpus: DataFrame): Array[(Long, Array[Float], Double)] = {
    import corpus.sparkSession.implicits._
    corpus.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
  }

  /** Sequential-double dot — the exact loop DotProduct generates. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** Spark's round(col, 6) for doubles (Round expression semantics). */
  private def round6(v: Double): Double =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Top-k cosine neighbors per probe; self-matches (vec_id == probe_id)
    * are excluded like the batch queries. Works on both streaming and
    * batch Datasets (same code path). */
  def topK(probes: Dataset[Probe], corpus: Array[(Long, Array[Float], Double)], k: Int): Dataset[Hit] = {
    import probes.sparkSession.implicits._
    val bc = probes.sparkSession.sparkContext.broadcast(corpus)
    probes.flatMap { p =>
      val pNorm = math.sqrt(dot(p.embedding, p.embedding))
      val scored = bc.value.iterator
        .filter(_._1 != p.probe_id)
        .map { case (id, v, norm) => (id, round6(dot(v, p.embedding) / (norm * pNorm))) }
        .toArray
      // bounded selection: (cos desc, vec_id asc), identical to TopKPerKey
      scala.util.Sorting.stableSort(scored,
        (a: (Long, Double), b: (Long, Double)) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      scored.iterator.take(k).zipWithIndex.map { case ((id, cos), i) =>
        Hit(p.probe_id, (i + 1).toLong, id, cos)
      }
    }
  }
}
