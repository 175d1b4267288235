package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy matching — the approximate cousin of the
  * reference's exact entity-key merge (`csr_transformations.py`'s
  * patient/diagnosis id joins assume clean keys; a real registry feed
  * needs a typo-tolerant pass first).
  *
  * The all-pairs edit-distance join is quadratic, so it NEVER runs
  * unblocked: candidates are generated per blocking key (an equi-join
  * Catalyst shuffles on the key), a cheap length prefilter drops most
  * pairs before the Levenshtein kernel, and only then does the O(m·n)
  * distance run. The blocking key is the scale dial — coarser keys trade
  * shuffle skew for recall; a production corpus would block on several
  * keys and union (the same multi-modal-sweep shape as the LSH family,
  * which handles the high-cardinality version of this problem). */
object Linkage {

  /** Fuzzy NAME matches: block on the name's noun (second word — the
    * item; typos/variants live in the qualifier), keep distinct-name
    * pairs within edit distance 1..2, each carrying how many parts bear
    * each spelling. Matching DISTINCT values, not rows, is the load-
    * bearing design decision: the first draft joined part rows directly
    * and the bench caught it at 31 s / 5.5M output pairs at sf0.1 —
    * duplicate-heavy keys make row-pair enumeration quadratic, while the
    * distinct-name relation is bounded by vocabulary (64 names here) and
    * grows sublinearly with the corpus. Entity-level pair enumeration,
    * when wanted, is one equi-join of this verdict table back to parts.
    * Identical spellings collapse into one name (their duplicate-ness is
    * the n_parts count — exact dedup's jurisdiction, not linkage's). */
  def fuzzyParts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val names = Tables(dir).part
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("p_name").as("name_a"), col("n_parts").as("n_parts_a"), col("blk"))
    val b = names.select(col("p_name").as("name_b"), col("n_parts").as("n_parts_b"), col("blk"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b")
        && abs(length(col("name_a")) - length(col("name_b"))) <= 2
        && levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_parts_a"), col("n_parts_b"))
  }

  private val fuzzyPartsSql =
    """WITH names AS (
      |  SELECT p_name, COUNT(*) AS n_parts, split_part(p_name, ' ', 2) AS blk
      |  FROM part GROUP BY 1),
      |m AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b,
      |    CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |    a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      |  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE ABS(LEN(a.p_name) - LEN(b.p_name)) <= 2
      |    AND levenshtein(a.p_name, b.p_name) <= 2)
      |SELECT * FROM m ORDER BY name_a, name_b""".stripMargin

  // ---------------------------------------------- segment-indexed join

  private val K = 2 // default edit-distance threshold

  /** Segment scheme for a string of length ℓ at threshold k: k+1
    * deterministic contiguous pieces (start, length) — an even split with
    * the remainder going to the TRAILING segments (the same partition the
    * greedy floor(remaining / pieces-left) recurrence produces, in closed
    * form). Any fixed partition works for the pigeonhole — k edits touch
    * ≤ k segments, so one survives.
    *
    * Closed form, columnar in BOTH ℓ and the segment index i (q = ℓ div
    * segs, r = ℓ mod segs): segment i starts at i·q + max(0, i−(segs−r))
    * with length q (+1 for the last r segments). Columnar-in-i matters:
    * it lets candidate generation be ONE higher-order `transform` lambda
    * over a literal combo table instead of (2k+1)²·(k+1) inlined CASE
    * structs — the inlined form grew the generated Generate method past
    * janino's 64 KB limit and silently dropped the whole kernel out of
    * whole-stage codegen (r05 verdict finding #3). */
  private def segStart(l: Column, i: Column, segs: Int): Column =
    (i * floor(l / segs).cast("int") +
      greatest(lit(0), i - (lit(segs) - l % segs))).cast("int")
  private def segLen(l: Column, i: Column, segs: Int): Column =
    (floor(l / segs).cast("int") +
      when(i >= lit(segs) - l % segs, 1).otherwise(0)).cast("int")

  /** §8g(ae) — PassJoin-style segment-indexed edit-distance self-join:
    * fuzzy linkage with NO blocking key at all, for when the distinct
    * vocabulary itself is too large for per-block quadratics. Pigeonhole:
    * if lev(a,b) ≤ 2, then at least one of a's 3 segments appears in b
    * UNEDITED, shifted by at most 2 — so the index side emits each
    * name's 3 (segment, idx, len) keys, the probe side emits every
    * substring of compatible length within the ±2 position window for
    * each candidate partner length (≤ 3·5·5 keys/name), and the
    * candidate join on the exact segment text replaces all-pairs
    * generation with an equi-join Catalyst shuffles like any other.
    * Candidate completeness is not asserted — it is PROVEN by the
    * oracle, which computes the naive all-pairs answer; any missed
    * candidate is a row-count mismatch. Verification (the actual
    * Levenshtein) runs only on the candidate set. */
  def fuzzySegments(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    segmentPairs(Tables(dir).part
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .select(col("p_name").as("nm"), col("n_parts")))
  }

  /** The segment-join core over an arbitrary (nm, n_parts) frame —
    * separated so the completeness property test can feed adversarial
    * edit pairs directly. `k` is the edit threshold (§8i(am): k+1
    * segments, ±k windows — probe keys grow as (2k+1)²(k+1) per name,
    * the price of a looser match). */
  private[operators] def segmentPairs(nameCounts: DataFrame, k: Int = K): DataFrame = {
    val segs = k + 1
    val names = nameCounts.select(col("nm"), col("n_parts"), length(col("nm")).as("len"))

    // index side: the k+1 exact segments of each name, one transform
    // lambda over the segment indices (codegen: one small loop body)
    val idxStructs = transform(typedlit((0 until segs).toList), i =>
      struct(substring(col("nm"), segStart(col("len"), i, segs) + 1,
          segLen(col("len"), i, segs)).as("txt"),
        i.as("seg"), col("len").as("l")))
    val index = names.select(col("nm").as("name_a"), col("n_parts").as("n_parts_a"),
        explode(idxStructs).as("k"))
      .select(col("name_a"), col("n_parts_a"), col("k.txt"), col("k.seg"), col("k.l"))
      .where(length(col("txt")) >= 1)

    // probe side: substrings at the segment's ±k window, for every
    // candidate partner length within ±k of our own. The (Δlen, segment,
    // shift) combos are a LITERAL table transformed by one lambda — the
    // generated code is one loop body regardless of k, where the old
    // (2k+1)²·(k+1) inlined structs overflowed janino's method limit.
    val trips = typedlit((for { d <- -k to k; i <- 0 until segs; w <- -k to k }
      yield (d, i, w)).toList)
    val probeStructs = transform(trips, t => {
      val l = (col("len") + t.getField("_1")).cast("int")
      val i = t.getField("_2")
      val start = (segStart(l, i, segs) + t.getField("_3")).cast("int")
      val len = segLen(l, i, segs)
      when(len >= 1 && start >= 0 && start + len <= col("len"),
        struct(substring(col("nm"), start + 1, len).as("txt"),
          i.as("seg"), l.as("l")))
    })
    val probe = names.select(col("nm").as("name_b"), col("n_parts").as("n_parts_b"),
        explode(probeStructs).as("k"))
      .where(col("k").isNotNull)
      .select(col("name_b"), col("n_parts_b"), col("k.txt"), col("k.seg"), col("k.l"))
      .distinct()

    val cands = index.join(probe, Seq("txt", "seg", "l"))
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_parts_a"), col("n_parts_b"))
      .distinct()
    // pairs can surface in either orientation (a indexed / b probing or
    // vice versa) — canonical order + distinct above dedups; verify:
    cands
      .where(levenshtein(col("name_a"), col("name_b")) <= k)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_parts_a"), col("n_parts_b"))
  }

  private val fuzzySegmentsSql =
    """WITH names AS (
      |  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1),
      |m AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b,
      |    CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |    a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      |  FROM names a JOIN names b ON a.p_name < b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 2)
      |SELECT * FROM m ORDER BY name_a, name_b""".stripMargin

  /** §8h(aj) — multi-column linkage keys through the same segment join:
    * the fields concatenate with an unprintable separator (so a typo in
    * ANY field is an edit in the composite, and fields can't bleed into
    * each other), distinct composites dedupe with counts, and
    * [[segmentPairs]] runs unchanged. The edit budget is shared across
    * fields — two one-char typos in two fields still match, three don't —
    * which is the record-linkage semantic a per-field threshold can't
    * give without a cross-product of per-field joins. */
  def fuzzyRecords(records: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "fuzzyRecords: no key columns")
    val composite = concat_ws("\u0001", keyCols.map(col): _*)
    segmentPairs(records
      .groupBy(composite.as("nm"))
      .agg(count(lit(1)).as("n_parts")))
  }

  /** Entity resolution endgame: connected components over the fuzzy-match
    * verdict table, collapsing spelling-variant chains into ONE canonical
    * entity each — the linkage counterpart of `dedup_survivors` (pairs
    * answer "are these two the same?"; a registry needs "which records
    * make up each entity?"). Components run on the DISTINCT-NAME graph
    * (bounded by vocabulary, like the pair step) via the shared
    * label-propagation core ([[DedupQueries.clustersOf]] — pointer-jumped,
    * O(log diameter) rounds, converge-or-throw); part rows re-enter only
    * as the per-variant counts being summed. Canonical = lexicographic
    * min name, matching the oracle's min-reachable recursive CTE. */
  def entityClusters(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val names = Tables(dir).part
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
    val pairs = fuzzyParts(spark, dir)
      .select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
    val labeled = DedupQueries.clustersOf(
      names.select(col("p_name").as("doc_id")), pairs)
    labeled.join(names, labeled("doc_id") === names("p_name"))
      .groupBy(col("cluster_rep").as("canonical_name"))
      .agg(count(lit(1)).as("n_variants"), sum(col("n_parts")).as("n_parts"))
  }

  private val entityClustersSql =
    """WITH RECURSIVE names AS (
      |  SELECT p_name, COUNT(*) AS n_parts, split_part(p_name, ' ', 2) AS blk
      |  FROM part GROUP BY 1),
      |m AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b
      |  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE ABS(LEN(a.p_name) - LEN(b.p_name)) <= 2
      |    AND levenshtein(a.p_name, b.p_name) <= 2),
      |edges AS (SELECT name_a AS s, name_b AS d FROM m
      |          UNION ALL SELECT name_b, name_a FROM m),
      |reach(id, r) AS (
      |  SELECT p_name, p_name FROM names
      |  UNION
      |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id),
      |labels AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY 1)
      |SELECT rep AS canonical_name, COUNT(*) AS n_variants,
      |  CAST(SUM(n.n_parts) AS BIGINT) AS n_parts
      |FROM labels JOIN names n ON n.p_name = labels.id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val SnmWindow = 4

  /** §8n(cm) — SORTED-NEIGHBORHOOD candidate generation (Hernández &
    * Stolfo), blocked: distinct names sort lexicographically WITHIN a
    * first-token block and every name is compared to its [[SnmWindow]]
    * sort-successors. The complementary blocking to [[fuzzyParts]]
    * (which blocks on the SECOND token): sorted-neighborhood surfaces
    * near-matches whose shared prefix puts them adjacent in sort order
    * even when the verify-critical tokens differ — the classic ER
    * recipe for prefix-heavy identifiers. Verify = edit distance ≤ 3:
    * one notch looser than the sibling's ≤ 2 because sort-adjacency has
    * already done half the filtering, and the pairs it keeps (shared
    * first token, divergent second) are EXACTLY the ones second-token
    * blocking is structurally blind to.
    *
    * Scale shape: matching DISTINCT names (vocabulary-bounded, the
    * sibling's load-bearing decision); the rank window runs per block —
    * block granularity (here one token; two subdivide) is the knob that
    * bounds per-task sort size; the window join is one equi-join on the
    * block key with a rank-range predicate. */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val names = Tables(dir).part
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("p_name"))
    val ranked = names.withColumn("rk", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(Cached.track)
    val a = ranked.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"), col("rk").as("rk_a"))
    val b = ranked.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"), col("rk").as("rk_b"))
    a.join(b, Seq("blk"))
      .where(col("rk_b") > col("rk_a") && col("rk_b") <= col("rk_a") + SnmWindow)
      .where(levenshtein(col("name_a"), col("name_b")) <= 3)
      .select(col("name_a"), col("name_b"),
        (col("rk_b") - col("rk_a")).cast("long").as("win_dist"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_parts_a"), col("n_parts_b"))
  }

  private val sortedNeighborhoodSql =
    s"""WITH names AS (
       |  SELECT p_name, COUNT(*) AS n_parts, split_part(p_name, ' ', 1) AS blk
       |  FROM part GROUP BY 1),
       |ranked AS (
       |  SELECT p_name, n_parts, blk,
       |    ROW_NUMBER() OVER (PARTITION BY blk ORDER BY p_name) AS rk
       |  FROM names)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |  b.rk - a.rk AS win_dist,
       |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       |  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
       |FROM ranked a JOIN ranked b
       |  ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + $SnmWindow
       |WHERE levenshtein(a.p_name, b.p_name) <= 3
       |ORDER BY name_a, name_b""".stripMargin

  // ----------------------------------------------- blocking quality

  /** §8p(dd) — blocking-recall audit: each blocker's verified match set
    * measured against the UNBLOCKED all-pairs truth at the blocker's own
    * edit threshold — the standard entity-resolution blocking metric
    * (how many true matches does the blocking scheme even let the
    * verifier see?). `link_fuzzy_parts` blocks on the 2nd token (blind
    * to pairs whose typo sits IN that token), the segment index is
    * pigeonhole-complete by construction (its recall row is the proof
    * landed as data), SNM sees only 4 sort-successors per block.
    *
    * The truth is a deliberate all-pairs Levenshtein over the DISTINCT
    * NAME table — |names|², the audit tier (the name domain is the
    * dimension side, orders of magnitude under the fact tables; the
    * length-band prefilter |Δlen| ≤ k is a lossless Levenshtein lower
    * bound that cuts most of the square before the expensive verify). */
  def blockingQuality(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val nm = Tables(dir).part.select(col("p_name")).distinct()
    val truth = Cached.track(nm.select(col("p_name").as("name_a"))
      .crossJoin(nm.select(col("p_name").as("name_b")))
      .where(col("name_a") < col("name_b")
        && abs(length(col("name_a")) - length(col("name_b"))) <= 3
        && levenshtein(col("name_a"), col("name_b")) <= 3)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .persist())
    def row(blocker: String, found: DataFrame, maxDist: Int): DataFrame =
      truth.where(col("dist") <= maxDist).agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .select(lit(blocker).as("blocker"), col("n_truth"), col("n_found"),
          expr("n_found * 1000 div n_truth").as("recall_pm"))
    row("token_block", fuzzyParts(spark, dir), 2)
      .unionByName(row("segment_index", fuzzySegments(spark, dir), 2))
      .unionByName(row("sorted_neighborhood", sortedNeighborhood(spark, dir), 3))
  }

  private val blockingQualitySql = {
    def truthCount(k: Int) =
      s"""(SELECT COUNT(*) FROM nm a JOIN nm b
         |   ON a.p_name < b.p_name AND ABS(LEN(a.p_name) - LEN(b.p_name)) <= $k
         |   WHERE levenshtein(a.p_name, b.p_name) <= $k)""".stripMargin
    s"""WITH nm AS (SELECT DISTINCT p_name FROM part),
       |names AS (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1),
       |tok AS (
       |  SELECT COUNT(*) AS n FROM (
       |    SELECT a.p_name FROM
       |      (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM nm) a
       |    JOIN (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM nm) b
       |      ON a.blk = b.blk AND a.p_name < b.p_name
       |    WHERE ABS(LEN(a.p_name) - LEN(b.p_name)) <= 2
       |      AND levenshtein(a.p_name, b.p_name) <= 2) x),
       |snm AS (
       |  SELECT COUNT(*) AS n FROM (
       |    SELECT a.p_name FROM
       |      (SELECT p_name, blk, ROW_NUMBER() OVER (PARTITION BY blk ORDER BY p_name) AS rk
       |       FROM (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM nm) z) a
       |    JOIN (SELECT p_name, blk, ROW_NUMBER() OVER (PARTITION BY blk ORDER BY p_name) AS rk
       |          FROM (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM nm) z) b
       |      ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + $SnmWindow
       |    WHERE levenshtein(a.p_name, b.p_name) <= 3) x),
       |rows_out AS (
       |  SELECT 'token_block' AS blocker, ${truthCount(2)} AS n_truth, (SELECT n FROM tok) AS n_found
       |  UNION ALL
       |  SELECT 'segment_index', ${truthCount(2)}, ${truthCount(2)}
       |  UNION ALL
       |  SELECT 'sorted_neighborhood', ${truthCount(3)}, (SELECT n FROM snm))
       |SELECT blocker, CAST(n_truth AS BIGINT) AS n_truth, CAST(n_found AS BIGINT) AS n_found,
       |  n_found * 1000 // n_truth AS recall_pm
       |FROM rows_out
       |ORDER BY blocker""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "link_blocking_quality" -> Q(blockingQuality _, blockingQualitySql,
      Seq(col("blocker"))),
    "link_sorted_neighborhood" -> Q(sortedNeighborhood _, sortedNeighborhoodSql,
      Seq(col("name_a"), col("name_b"))),
    "link_fuzzy_parts" -> Q(fuzzyParts _, fuzzyPartsSql, Seq(col("name_a"), col("name_b"))),
    "link_fuzzy_segments" -> Q(fuzzySegments _, fuzzySegmentsSql, Seq(col("name_a"), col("name_b"))),
    "link_entity_clusters" -> Q(entityClusters _, entityClustersSql, Seq(col("canonical_name"))),
  )
}
