package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, Q] = Map(
    "link_fuzzy_parts" -> Q(fuzzyParts _, fuzzyPartsSql, Seq(col("name_a"), col("name_b"))),
  )
}
