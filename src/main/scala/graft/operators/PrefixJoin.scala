package graft.operators

import graft.Q
import graft.functions.TextFunctions.{shingles, words}
import graft.plans.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join via prefix filtering (the
  * AllPairs/PPJoin family, Bayardo et al., WWW'07 — public algorithm).
  *
  * The LSH family ([[DedupQueries]]) is probabilistic: a qualifying pair
  * that never shares a band is silently lost. This operator emits EVERY
  * pair of documents whose 3-gram SHINGLE-set Jaccard ≥ τ (τ = 1/2 — the
  * same unit and threshold as the LSH verify, so this is its exact
  * mirror), with no randomized misses, and the DuckDB oracle proves it:
  * the oracle computes the naive all-pairs answer directly, so any pair
  * the prefix filter dropped would fail the round's hash compare.
  * (Word-SET similarity is the wrong unit on this corpus: the synthetic
  * vocabulary is ~30 words, so nearly every pair of documents has
  * word-Jaccard ≥ 1/2 vacuously; shingle sequences separate real near-dups
  * from coincidence.)
  *
  * Prefix-filter principle: order every document's distinct shingles by
  * one global total order (ascending document frequency, rarest first —
  * ties by shingle), and index only each document's first
  * p = |x| − ⌈τ·|x|⌉ + 1 shingles (for τ = 1/2: ⌊|x|/2⌋ + 1). Any pair
  * with J ≥ τ must share ≥1 PREFIX token on both sides: if all shared
  * tokens sat outside either prefix, the overlap would be at most
  * ⌈τ·min(|x|,|y|)⌉ − 1 < τ/(1+τ)·(|x|+|y|), contradicting J ≥ τ.
  * Rarest-first ordering makes prefix tokens nearly unique, so the
  * candidate buckets stay tiny.
  *
  * Verification is exact integer arithmetic: intersections are counted by
  * the [[graft.plans.SortedIntersectCount]] codegen kernel over sorted
  * md5-hashed shingle sets (the same 15-nibble hashing as
  * `dedup_jaccard_sorted`, mirrored bit-identically in the oracle), and
  * J ≥ 1/2 is tested as 3·inter ≥ |x| + |y| — no float anywhere.
  *
  * Scale shape (100 TB): token df is one keyed shuffle over distinct
  * (doc, token) pairs; prefix re-assembly one doc-keyed shuffle; candidate
  * pairs come from [[Banded.pairsExec]]'s single bucket-clustered exchange
  * keyed on the prefix token (never all-pairs — rare-first prefixes bound
  * bucket occupancy); the verify joins are candidate-bounded. No driver
  * state, no broadcast of anything unbounded.
  */
object PrefixJoin {

  /** τ = 1/2 as integers: J ≥ N/D tested as D·inter ≥ N·(na+nb−inter),
    * i.e. (D+N)·inter ≥ N·(na+nb). Matches [[DedupQueries.JaccardThreshold]]
    * so the exact join and the LSH verify answer the same question. */
  private val TauNum = 1
  private val TauDen = 2

  /** (doc_id, w) distinct 3-gram shingle arrays. Shingling matches
    * [[DedupQueries]]'s convention, including the short-doc fallback
    * (docs under 3 words shingle to their whole text) — which also means
    * the set is NEVER empty, so no emptiness guard is needed (a
    * `where(size(w) > 0)` here measured 9.3 s at sf0.1: the pushed-down
    * predicate re-evaluates the whole shingle expression tree per row
    * outside the projection's codegen, for a filter that can never drop a
    * row). */
  private def wordSets(t: Tables): DataFrame =
    t.documents
      .withColumn("ww", words(col("text")))
      .withColumn("w", array_distinct(shingles("ww")))
      .select("doc_id", "w")

  /** (doc_id, hs) sorted hashed token sets + n = |set|. */
  private def hashedSets(ws: DataFrame): DataFrame =
    ws.select(
      col("doc_id"),
      array_sort(array_distinct(
        transform(col("w"), x => VectorExpressions.hexPrefix(md5(x), 15)))).as("hs"))
      .withColumn("n", size(col("hs")))

  /** All pairs with word-set Jaccard ≥ 1/2: (doc_a, doc_b, n_inter, n_union). */
  def allPairsJaccard(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    // persisted: the prefix branch (freq + re-group) and the verify branch
    // (hashed sets) both consume the shingle table — without the barrier
    // the corpus is re-shingled once per consumer
    val ws = Cached.track(wordSets(t)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // global rarity order: token -> document frequency (distinct docs)
    val tok = ws.select(col("doc_id"), explode(col("w")).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("df"))

    // per doc: tokens sorted rarest-first, keep the first
    // p = n − ⌈τ·n⌉ + 1 (the Jaccard probing prefix). n here is the
    // token-set size; the verify filter below recomputes n from the
    // hashed set so engine and oracle use the same universe.
    val prefixes = tok.join(freq, Seq("token"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("st"))
      .select(
        col("doc_id"),
        expr(s"transform(slice(st, 1, cast(size(st) - ((size(st) * $TauNum + $TauDen - 1) div $TauDen) + 1 as int)), x -> x.token)")
          .as("pre"))

    // candidate pairs: one bucket-clustered exchange keyed on prefix token
    val pre = prefixes.select(col("doc_id"), explode(col("pre")).as("token"))
    val cand = Banded.pairsExec(pre, Seq("token"), "doc_id")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .distinct()

    // exact verify on sorted hashed sets; integer cross-multiplied τ test
    val sets = hashedSets(ws)
    val inter = VectorExpressions.sortedIntersect(col("hs_a"), col("hs_b"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("n_inter", inter)
      .where(col("n_inter") * (TauDen + TauNum) >= (col("n_a") + col("n_b")) * TauNum)
      .select(
        col("doc_a"), col("doc_b"), col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"))
  }

  /** Naive all-pairs oracle: no prefix filter — every pair the engine's
    * pruning could possibly lose is present here. */
  private val allPairsJaccardSql = {
    val h = DedupQueries.hexToLongDuck("md5(token)", 15)
    s"""WITH ws AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
       |                             x -> LEN(x) > 0) AS w
       |  FROM documents),
       |shl AS (SELECT doc_id, CASE WHEN LEN(w) >= 3
       |    THEN list_transform(generate_series(1, LEN(w) - 2),
       |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |    ELSE [array_to_string(w, ' ')] END AS s FROM ws),
       |hs AS (SELECT doc_id, $h AS hv
       |       FROM (SELECT doc_id, UNNEST(list_distinct(s)) AS token FROM shl)),
       |hsd AS (SELECT DISTINCT doc_id, hv FROM hs),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM hsd GROUP BY 1),
       |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |       FROM hsd a JOIN hsd b ON a.hv = b.hv AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_inter, sa.n + sb.n - n_inter AS n_union
       |FROM ip JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |WHERE n_inter * ${TauDen + TauNum} >= (sa.n + sb.n) * $TauNum
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "dedup_allpairs_jaccard" -> Q(allPairsJaccard _, allPairsJaccardSql,
      Seq(col("doc_a"), col("doc_b"))),
  )
}
