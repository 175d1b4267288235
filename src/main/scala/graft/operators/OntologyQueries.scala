package graft.operators

import graft.Q
import graft.functions.Num.{dsum, fin}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ontology-tree rollup driven by the packaged config (SURVEY §2.2 row 16).
  *
  * Unlike the fixed two-level `q_tree_rollup`, the tree here has arbitrary
  * depth (the packaged config nests to depth 4) and comes entirely from
  * configuration, mirroring the reference's ontology_config.json → concept
  * path semantics. The (concept → ancestor path) mapping is broadcast; the
  * fact table aggregates once, keyed by path.
  */
object OntologyQueries {

  private lazy val mapping: Seq[(String, String)] =
    Ontology.conceptAncestors(Ontology.loadResource())

  /** Counts + balance totals at every tree node the config defines. */
  def ontologyRollup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val m = mapping.toDF("concept", "path")
    Tables(dir).customer
      .join(broadcast(m), col("c_mktsegment") === col("concept"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_customers"), fin(dsum(col("c_acctbal"))).as("total_acctbal"))
  }

  private def ontologyRollupSql: String = {
    // DuckDB string literals are not backslash-escaped; only quotes double
    val plainValues = mapping
      .map { case (c, p) => s"('$c', '${p.replace("'", "''")}')" }
      .mkString(",\n  ")
    s"""WITH m(concept, path) AS (VALUES
       |  $plainValues)
       |SELECT path, COUNT(*) AS n_customers,
       |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_acctbal
       |FROM customer JOIN m ON c_mktsegment = concept
       |GROUP BY path ORDER BY path""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "ontology_rollup" -> Q(ontologyRollup _, ontologyRollupSql, Seq(col("path"))),
  )
}
