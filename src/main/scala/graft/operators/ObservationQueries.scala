package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship artifact end-to-end: the tranSMART observation
  * model (csr2transmart — luigi-pipeline/main.py:115-126 drives it).
  *
  * Composite pipeline: wide patient table (entity join) → EAV melt (one
  * typed observation per non-null cell) → broadcast concept-dimension join
  * (concept code → concept path + value type). This is the whole
  * sources→observations path as ONE declarative plan: the melt is a narrow
  * stack(), the dimension join is a broadcast hash join, so the only
  * shuffle in the entire flagship query is whatever ordering the harness
  * asks for — the 100 TB shape the reference's row-by-row Python transform
  * cannot have.
  */
object ObservationQueries {

  /** Concept dimension (code → tranSMART path, value kind) — config-bounded
    * like the reference's ontology/concept config. */
  private val conceptDim: Seq[(String, String, String)] = Seq(
    ("Customer.balance", "\\Demographics\\Balance\\", "N"),
    ("Customer.segment", "\\Demographics\\Segment\\", "T"),
    ("Customer.nation", "\\Demographics\\Nation\\", "T"),
    ("Customer.since", "\\Administrative\\FirstOrder\\", "D"))

  def observations(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val t = Tables(dir)
    // wide patient table: customer ⋈ nation (broadcast dim) + first order
    // date per customer (the reference derives per-entity dates the same way)
    val firstOrder = t.orders.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).cast("date").as("since"))
    val wide = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(firstOrder, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey").as("patient_num"),
        col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"),
        col("n_name").as("nation"),
        col("since"))
    val melted = EavMelt.melt(wide, "patient_num", Seq(
      ("balance", "Customer.balance", EavMelt.NumValue),
      ("segment", "Customer.segment", EavMelt.TextValue),
      ("nation", "Customer.nation", EavMelt.TextValue),
      ("since", "Customer.since", EavMelt.DateValue)))
    val dim = conceptDim.toDF("concept_cd", "concept_path", "value_type")
    melted.join(broadcast(dim), Seq("concept_cd"))
      .select(
        col("entity_id").as("patient_num"),
        col("concept_cd"), col("concept_path"), col("value_type"),
        col("num_value"), col("str_value"), col("date_value"))
  }

  private def observationsSql: String = {
    val dimValues = conceptDim
      .map { case (c, p, k) => s"('$c', '$p', '$k')" }.mkString(", ")
    s"""WITH dim(concept_cd, concept_path, value_type) AS (VALUES $dimValues),
       |wide AS (
       |  SELECT c_custkey AS patient_num, c_acctbal AS balance,
       |    c_mktsegment AS segment, n_name AS nation, fo.since
       |  FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey
       |  LEFT JOIN (SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS since
       |             FROM orders GROUP BY o_custkey) fo ON c_custkey = fo.o_custkey),
       |melted AS (
       |  SELECT patient_num, 'Customer.balance' AS concept_cd,
       |    balance AS num_value, CAST(NULL AS VARCHAR) AS str_value, CAST(NULL AS DATE) AS date_value
       |  FROM wide WHERE balance IS NOT NULL
       |  UNION ALL
       |  SELECT patient_num, 'Customer.segment', NULL, segment, NULL FROM wide WHERE segment IS NOT NULL
       |  UNION ALL
       |  SELECT patient_num, 'Customer.nation', NULL, nation, NULL FROM wide WHERE nation IS NOT NULL
       |  UNION ALL
       |  SELECT patient_num, 'Customer.since', NULL, NULL, since FROM wide WHERE since IS NOT NULL)
       |SELECT patient_num, melted.concept_cd, concept_path, value_type,
       |  num_value, str_value, date_value
       |FROM melted JOIN dim ON melted.concept_cd = dim.concept_cd
       |ORDER BY patient_num, melted.concept_cd""".stripMargin
  }

  /** Modifier-dimension observations (csr2transmart attaches diagnosis /
    * biosource / biomaterial ids as modifiers so a fact row is scoped to
    * the sub-entity it came from, not just the patient). Orders play the
    * diagnosis level: the melt is keyed by the sub-entity id and each
    * observation carries (modifier_cd, instance_num) plus the patient. */
  def observationsMod(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val wide = t.orders.select(
      col("o_orderkey").as("instance_num"),
      col("o_custkey").as("patient_num"),
      col("o_totalprice").as("price"),
      col("o_orderpriority").as("priority"))
    val melted = EavMelt.melt(wide, "instance_num", Seq(
      ("price", "Diagnosis.price", EavMelt.NumValue),
      ("priority", "Diagnosis.priority", EavMelt.TextValue)))
    melted
      .withColumnRenamed("entity_id", "instance_num")
      .join(wide.select("instance_num", "patient_num"), Seq("instance_num"))
      .select(
        col("patient_num"),
        lit("DIAGNOSIS_ID").as("modifier_cd"),
        col("instance_num"),
        col("concept_cd"), col("num_value"), col("str_value"))
  }

  private val observationsModSql =
    """SELECT o_custkey AS patient_num, 'DIAGNOSIS_ID' AS modifier_cd,
      |  o_orderkey AS instance_num, concept_cd, num_value, str_value
      |FROM (
      |  SELECT o_orderkey, o_custkey, 'Diagnosis.price' AS concept_cd,
      |    o_totalprice AS num_value, CAST(NULL AS VARCHAR) AS str_value
      |  FROM orders WHERE o_totalprice IS NOT NULL
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'Diagnosis.priority', NULL, o_orderpriority
      |  FROM orders WHERE o_orderpriority IS NOT NULL) x
      |ORDER BY instance_num, concept_cd""".stripMargin

  val queries: Map[String, Q] = Map(
    "csr_observations" -> Q(observations _, observationsSql,
      Seq(col("patient_num"), col("concept_cd"))),
    "csr_observations_mod" -> Q(observationsMod _, observationsModSql,
      Seq(col("instance_num"), col("concept_cd"))),
  )
}
