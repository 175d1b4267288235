package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape metrics for every registered query — the PLANS.md audit
  * discipline automated, and a regression guard for it ([[BenchGuard]]'s
  * sibling: that one gates COST drift, this one gates SHAPE drift, which
  * moves earlier and more deterministically than timings).
  *
  * A query's physical-plan fingerprint counts the operators that decide
  * scale behavior: shuffle exchanges (each one a full-cluster data
  * movement at 100 TB), broadcast exchanges, sorts, cartesian/nested-loop
  * joins (the anti-pattern the inventory must never regress into), cache
  * reads, and the engine's own custom operators. Anchors are committed
  * (`plan_anchors.json`); `PlanGuardSpec` fails if any query GROWS its
  * shuffle count, its sort count, or acquires a cartesian — catching,
  * e.g., a broadcast join silently degrading to sort-merge after a
  * refactor, months before the bench notices at scale.
  *
  * Metrics are taken from the ADAPTIVE INITIAL plan (pre-execution, AQE
  * not yet re-planned) — deterministic for fixed data + conf, which is
  * what an anchor needs; AQE's runtime improvements only ever remove
  * exchanges, never add them.
  */
object PlanAudit {

  final case class PlanMetrics(shuffles: Int, broadcasts: Int, sorts: Int,
                               cartesians: Int, cacheReads: Int, customOps: Int) {
    def line: String =
      s"""{"shuffles":$shuffles,"broadcasts":$broadcasts,"sorts":$sorts,""" +
        s""""cartesians":$cartesians,"cacheReads":$cacheReads,"customOps":$customOps}"""
  }

  /** Count plan-shape-relevant operators over the whole tree, including
    * AQE initial plans and reused subtrees. */
  def metrics(df: DataFrame): PlanMetrics = {
    val all = flatten(df.queryExecution.executedPlan)
    def n(pred: String => Boolean) = all.count(p => pred(p.getClass.getSimpleName))
    PlanMetrics(
      shuffles = n(_.startsWith("ShuffleExchange")),
      broadcasts = n(_.startsWith("BroadcastExchange")),
      sorts = n(_ == "SortExec"),
      cartesians = n(s => s.startsWith("CartesianProduct") || s.startsWith("BroadcastNestedLoopJoin")),
      cacheReads = n(_.startsWith("InMemoryTableScan")),
      customOps = n(s => s.startsWith("BandedPairsExec") || s.contains("TopKExec")))
  }

  /** Full tree walk that pierces the wrappers `collect` stops at:
    * AdaptiveSparkPlanExec (initial plan), InMemoryTableScan (cached
    * child plan is NOT descended — the cached subtree executed once at
    * fill time, not per read), QueryStage, ReusedExchange/Subquery. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children: Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.initialPlan)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }

  /** Dump the whole registry's fingerprints as one JSON object:
    * `runMain graft.PlanAudit <sfDir> <outPath>`. Queries whose plan
    * cannot be constructed (they EXECUTE driver-side loops — the
    * iterative graph family) are recorded with their final plan as
    * built; any that throw are skipped loudly on stderr. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "plan_anchors.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    graft.sources.Tables(sfDir)(spark).assertVintage()
    val entries = SparkEntry.registry.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        val m = metrics(q.fn(spark, sfDir))
        Some(s""""$name":${m.line}""")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plan-audit] $name failed: ${e.getMessage}"); None
      } finally {
        // releaseAll is non-blocking: a lingering cache entry lets the
        // NEXT query's plan match a canonically-equal subtree from this
        // one (observed: dedup_containment's shingle build matching
        // dedup_clusters' persisted bands → +3 phantom custom ops in the
        // anchor). clearCache makes every fingerprint hermetic.
        graft.operators.Cached.releaseAll()
        spark.catalog.clearCache()
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      entries.mkString("{\n", ",\n", "\n}\n"))
    System.err.println(s"[plan-audit] wrote ${entries.size} fingerprints to $out")
    spark.stop()
  }

  /** Parse a committed anchors file: name -> metrics. */
  def loadAnchors(path: String): Option[Map[String, PlanMetrics]] = {
    val f = new java.io.File(path)
    if (!f.exists()) return None
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val entry = """"([a-z0-9_]+)":\{"shuffles":(\d+),"broadcasts":(\d+),"sorts":(\d+),"cartesians":(\d+),"cacheReads":(\d+),"customOps":(\d+)\}""".r
    Some(entry.findAllMatchIn(text).map { m =>
      m.group(1) -> PlanMetrics(m.group(2).toInt, m.group(3).toInt, m.group(4).toInt,
        m.group(5).toInt, m.group(6).toInt, m.group(7).toInt)
    }.toMap)
  }
}
