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
    // r15 (opt): the shingle front comes STAGED — the per-doc hashed
    // 3-gram arrays ([[DedupQueries.stagedSourceShingles]], content-gated
    // on the documents table) replace the per-run tokenize+shingle+md5
    // pass AND the in-query persist barrier that materialized it. Tokens
    // travel as the 60-bit hashes everywhere (freq, prefixes, candidate
    // buckets): prefix-filter completeness holds under ANY global total
    // order, and the verify already ran on these same hashes, so the
    // emitted pair set is unchanged (the oracle computes the naive
    // all-pairs answer over the identical hashed universe).
    val ws = DedupQueries.stagedSourceShingles(spark, dir).select(col("doc_id"), col("hs"))

    // global rarity order: token -> document frequency (distinct docs)
    val tok = ws.select(col("doc_id"), explode(col("hs")).as("token"))
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
    val sets = ws.select(col("doc_id"), array_sort(col("hs")).as("hs"))
      .withColumn("n", size(col("hs")))
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

  // --------------------------------------------------- incremental exact

  /** Per-doc probing prefixes under a GIVEN global token order
    * (df-ascending, ties by token; tokens absent from `freq` count as
    * df = 0, i.e. rarest). Any single total order is sufficient for
    * prefix-filter completeness — the frequency part only optimizes
    * bucket occupancy — which is what lets the archive FREEZE its order
    * at index-build time and batches reuse it unchanged. */
  private def prefixesWith(ws: DataFrame, freq: DataFrame): DataFrame =
    ws.select(col("doc_id"), explode(col("w")).as("token"))
      .join(freq, Seq("token"), "left")
      .withColumn("df0", coalesce(col("df"), lit(0L)))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df0"), col("token")))).as("st"))
      .select(
        col("doc_id"),
        expr(s"transform(slice(st, 1, cast(size(st) - ((size(st) * $TauNum + $TauDen - 1) div $TauDen) + 1 as int)), x -> x.token)")
          .as("pre"))

  /** Exact batch-vs-archive similarity join: EVERY (batch, archive) pair
    * with shingle-set Jaccard ≥ τ — the deterministic mirror of
    * `dedup_incremental`, with the same membership split (md5-bucket
    * < 80 = archive, ≥ 80 = today's batch) and the same
    * never-pair-the-archive-with-itself shape: candidates are strictly
    * batch-prefix × archive-prefix on the shared token, archive-internal
    * pairs never form. The token order is the ARCHIVE's frequency table
    * (frozen at index time — see [[prefixesWith]]), so the staged
    * catalog variant below produces identical results. */
  def allPairsIncremental(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    // r15 (opt): staged hashed shingle arrays (see [[allPairsJaccard]]) —
    // the membership bucket derives from doc_id alone, so the former
    // documents re-scan + join is gone with the shingle pass. The frozen
    // archive order is the hashed-token df order (any total order is
    // complete; the catalog variant keeps its own string order).
    val bucket = VectorExpressions.hexPrefix(md5(col("doc_id").cast("string")), 8) % 100
    val ws = DedupQueries.stagedSourceShingles(spark, dir)
      .select(col("doc_id"), col("hs").as("w"), (bucket < 80).as("in_index"))
    val archive = ws.where(col("in_index")).select("doc_id", "w")
    val batch = ws.where(!col("in_index")).select("doc_id", "w")
    val freq = archive.select(explode(col("w")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    def pre(side: DataFrame) = prefixesWith(side, freq)
      .select(col("doc_id"), explode(col("pre")).as("token"))
    val cand = pre(batch).select(col("doc_id").as("batch_doc"), col("token"))
      .join(pre(archive).select(col("doc_id").as("index_doc"), col("token")), Seq("token"))
      .select("batch_doc", "index_doc").distinct()
    def sortedSets(side: DataFrame) = side
      .select(col("doc_id"), array_sort(col("w")).as("hs"))
      .withColumn("n", size(col("hs")))
    val setsB = sortedSets(batch)
    val setsA = sortedSets(archive)
    val inter = VectorExpressions.sortedIntersect(col("hs_a"), col("hs_b"))
    cand
      .join(setsB.select(col("doc_id").as("batch_doc"), col("hs").as("hs_a"), col("n").as("n_a")), Seq("batch_doc"))
      .join(setsA.select(col("doc_id").as("index_doc"), col("hs").as("hs_b"), col("n").as("n_b")), Seq("index_doc"))
      .withColumn("n_inter", inter)
      .where(col("n_inter") * (TauDen + TauNum) >= (col("n_a") + col("n_b")) * TauNum)
      .select(col("batch_doc"), col("index_doc"), col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"))
  }

  private val allPairsIncrementalSql = {
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
       |bk AS (SELECT doc_id, ${graft.functions.DuckSql.docBucket} AS bucket FROM documents),
       |ip AS (SELECT b.doc_id AS batch_doc, a.doc_id AS index_doc, COUNT(*) AS n_inter
       |       FROM hsd a JOIN hsd b ON a.hv = b.hv
       |       JOIN bk ka ON ka.doc_id = a.doc_id
       |       JOIN bk kb ON kb.doc_id = b.doc_id
       |       WHERE ka.bucket < 80 AND kb.bucket >= 80
       |       GROUP BY 1, 2)
       |SELECT batch_doc, index_doc, n_inter, sa.n + sb.n - n_inter AS n_union
       |FROM ip JOIN sz sa ON sa.doc_id = batch_doc JOIN sz sb ON sb.doc_id = index_doc
       |WHERE n_inter * ${TauDen + TauNum} >= (sa.n + sb.n) * $TauNum
       |ORDER BY batch_doc, index_doc""".stripMargin
  }

  /** Stage the archive side of the exact incremental join as bucketed
    * catalog tables: probing-prefix postings on the candidate join key
    * (token), hashed sets on the verify key (doc_id), and the frozen
    * token-frequency order. Later cycles shuffle ONLY the new batch —
    * the archive reads straight from its buckets
    * ([[PrefixIndexSpec]] pins zero Exchange above the index scans). */
  def persistPrefixIndexBucketed(spark: SparkSession, dir: String, path: String,
                                 buckets: Int = 8, prefix: String = "allpairs_idx"): Unit = {
    VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val bucket = VectorExpressions.hexPrefix(md5(col("doc_id").cast("string")), 8) % 100
    val archive = wordSets(t)
      .join(t.documents.select(col("doc_id"), (bucket < 80).as("in_index")), Seq("doc_id"))
      .where(col("in_index")).select("doc_id", "w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val freq = archive.select(explode(col("w")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_freq")
      freq.write.format("parquet")
        .bucketBy(buckets, "token").sortBy("token")
        .option("path", s"$path/freq").saveAsTable(s"${prefix}_freq")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_prefix")
      prefixesWith(archive, freq)
        .select(col("doc_id"), explode(col("pre")).as("token"))
        .write.format("parquet")
        .bucketBy(buckets, "token").sortBy("token")
        .option("path", s"$path/prefix").saveAsTable(s"${prefix}_prefix")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_sets")
      hashedSets(archive)
        .write.format("parquet")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .option("path", s"$path/sets").saveAsTable(s"${prefix}_sets")
    } finally archive.unpersist()
  }

  /** The exact incremental join served from the staged catalog index:
    * same result as [[allPairsIncremental]] (spec-pinned), but the
    * archive is never re-shingled and never re-shuffled. */
  def allPairsIncrementalFromCatalog(spark: SparkSession, dir: String,
                                     prefix: String = "allpairs_idx"): DataFrame = {
    VectorExpressions.register(spark)
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val bucket = VectorExpressions.hexPrefix(md5(col("doc_id").cast("string")), 8) % 100
    val batch = Cached.track(wordSets(t)
      .join(t.documents.select(col("doc_id"), (bucket < 80).as("in_index")), Seq("doc_id"))
      .where(!col("in_index")).select("doc_id", "w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val freq = spark.table(s"${prefix}_freq")
    val cand = prefixesWith(batch, freq)
      .select(col("doc_id").as("batch_doc"), explode(col("pre")).as("token"))
      .join(spark.table(s"${prefix}_prefix").select(col("doc_id").as("index_doc"), col("token")),
        Seq("token"))
      .select("batch_doc", "index_doc").distinct()
    val setsB = hashedSets(batch)
    val inter = VectorExpressions.sortedIntersect(col("hs_a"), col("hs_b"))
    cand
      .join(setsB.select(col("doc_id").as("batch_doc"), col("hs").as("hs_a"), col("n").as("n_a")), Seq("batch_doc"))
      .join(spark.table(s"${prefix}_sets")
        .select(col("doc_id").as("index_doc"), col("hs").as("hs_b"), col("n").as("n_b")), Seq("index_doc"))
      .withColumn("n_inter", inter)
      .where(col("n_inter") * (TauDen + TauNum) >= (col("n_a") + col("n_b")) * TauNum)
      .select(col("batch_doc"), col("index_doc"), col("n_inter"),
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
    "dedup_allpairs_incremental" -> Q(allPairsIncremental _, allPairsIncrementalSql,
      Seq(col("batch_doc"), col("index_doc"))),
  )
}
