package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator invariants of the dedup family: the round-3 additions
  * must stay consistent with the operators they compose. */
class DedupInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("quality survivors pick exactly one member per cluster, same clusters as min-id survivors") {
    val minId = DedupQueries.queries("dedup_survivors").fn(spark, dir)
      .select("kept_doc_id").collect().map(_.getLong(0)).toSet
    val byQuality = DedupQueries.queries("dedup_quality_survivors").fn(spark, dir)
      .select("cluster_id", "kept_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // one survivor per cluster, cluster ids = the min-id representatives
    assert(byQuality.map(_._1).distinct.length == byQuality.length)
    assert(byQuality.map(_._1).toSet == minId)
    // the chosen member belongs to its own cluster
    val clusters = DedupQueries.queries("dedup_clusters").fn(spark, dir)
      .select("doc_id", "cluster_rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQuality.foreach { case (cluster, kept) => assert(clusters(kept) == cluster) }
  }

  test("cross-modal audit scores exactly the jaccard candidate pairs that have embeddings") {
    val jaccard = DedupQueries.queries("dedup_ngram_jaccard").fn(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val audit = DedupQueries.queries("dedup_crossmodal_audit").fn(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audit.subsetOf(jaccard))
    val vecIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = jaccard.filter { case (a, b) => vecIds(a) && vecIds(b) }
    assert(audit == expected)
  }

  test("multiprobe LSH pairs that are also text LSH candidates agree on near-dup direction") {
    // sanity: the two modalities' LSH candidate machineries run on the
    // same corpus without interfering (registry isolation smoke)
    val ann = AnnQueries.queries("ann_lsh_multiprobe").fn(spark, dir).count()
    val txt = DedupQueries.queries("dedup_minhash_lsh").fn(spark, dir).count()
    assert(ann > 0 && txt > 0)
  }

  test("semantic dedup: drops point at a strictly lower retained id, so cluster minima survive") {
    import org.apache.spark.sql.functions.col
    val rows = AnnQueries.queries("dedup_semantic_clusters").fn(spark, dir)
      .select(col("vec_id"), col("dup_of")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // dup_of < vec_id by construction ⇒ the lowest id of every similarity
    // group is never dropped (exactly one canonical survivor chain exists)
    assert(rows.forall { case (v, d) => d < v })
    // no vec is dropped twice (one report row per dropped vec)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("hashed-set Jaccard verify (merge kernel) agrees with the string-set verify") {
    import spark.implicits._
    def byPair(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "jaccard", "is_near_dup")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val got = byPair(DedupQueries.jaccardSorted(spark, dir))
    val want = byPair(DedupQueries.ngramJaccard(spark, dir))
    assert(got.nonEmpty && got.keySet == want.keySet)
    // 60-bit hashes: collision-free here, so the hashed Jaccard is the
    // string-set Jaccard exactly
    assert(got == want)
  }
}
