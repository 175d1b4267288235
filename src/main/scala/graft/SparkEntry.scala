package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered operator query (SURVEY §2 inventory) from the
  * operator modules; each entry pairs a Spark plan with the DuckDB oracle SQL
  * the driver uses for the correctness gate.
  */
object SparkEntry {
  private def modules: Seq[Map[String, Q]] = Seq(
    operators.Relational.queries,
    operators.TpchRing.queries,
    operators.CorpusQueries.queries,
    operators.CsrQueries.queries,
    operators.TextQueries.queries,
    operators.TextIndexQueries.queries,
    operators.DedupQueries.queries,
    operators.AnnQueries.queries,
    operators.MultimodalQueries.queries,
    operators.OntologyQueries.queries,
    operators.ObservationQueries.queries,
    operators.AnalyticsQueries.queries,
    operators.JoinQueries.queries,
    operators.StorageQueries.queries,
    operators.EventAnalytics.queries,
    operators.ChangeData.queries,
    operators.Linkage.queries,
    operators.GraphQueries.queries,
    operators.RangeJoin.queries,
    operators.MultiIntervalJoin.queries,
    operators.IntervalCoverage.queries,
    operators.NgsQueries.queries,
    operators.SplitQueries.queries,
    operators.PrefixJoin.queries,
    operators.PipelineReport.queries,
    operators.BitextQueries.queries,
    operators.ProjectionQueries.queries,
    operators.SubstringDedup.queries,
  )

  /** Full registry (Spark fn + oracle + canonical Verify sort).
    *
    * Module key sets must be DISJOINT: a plain `++` would let a later
    * module silently shadow an earlier query (it happened — a round-7c
    * `docs_stratified_sample` overwrote the round-7b query of the same
    * name and the board stayed green while coverage shrank by one), so
    * any duplicate key is a loud error at first registry touch. */
  lazy val registry: Map[String, Q] = {
    val all = modules.flatMap(_.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query keys across operator modules: ${dups.mkString(", ")}")
    modules.reduce(_ ++ _)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The observation pipeline is the reference's defining artifact
    * (sources → wide entities → EAV melt → concept dimensions). */
  def entry(spark: SparkSession): DataFrame =
    operators.ObservationQueries.observations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
