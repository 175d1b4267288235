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

  /** Fuzzy part-name matches: block on the name's noun (second word — the
    * item; typos/variants live in the qualifier), keep pairs within edit
    * distance 2. Pairs with distance 0 are true duplicate names — the
    * exact-dedup family's catch — retained here because a linkage pass
    * reports them the same way. */
  def fuzzyParts(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val p = Tables(dir).part
      .select(col("p_partkey"), col("p_name"),
        element_at(split(col("p_name"), " "), 2).as("blk"))
    val a = p.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"), col("blk"))
    val b = p.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .where(col("key_a") < col("key_b")
        && abs(length(col("name_a")) - length(col("name_b"))) <= 2
        && levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }

  private val fuzzyPartsSql =
    """WITH p AS (
      |  SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk FROM part)
      |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      |WHERE ABS(LEN(a.p_name) - LEN(b.p_name)) <= 2
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY key_a, key_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "link_fuzzy_parts" -> Q(fuzzyParts _, fuzzyPartsSql, Seq(col("key_a"), col("key_b"))),
  )
}
