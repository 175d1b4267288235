package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch decomposition probe for the optimization round — NOT registered,
  * deleted (or inert) at round close. Times registered queries with AQE
  * on vs off (min of 2 steady-state runs after a warm run) and checks the
  * outputs are identical. */
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "graph_hits", "graph_closeness", "graph_components", "graph_pagerank_served",
      "graph_bfs_hops", "graph_label_prop", "docs_bpe_merges", "docs_pipeline_report",
      "dedup_clusters", "dedup_source_overlap", "docs_hard_negatives",
      "text_bigram_lm", "ann_projection_audit", "q_stats_moments", "dedup_containment",
      "graph_resource_allocation", "graph_jaccard_neighbors", "docs_ppl_buckets",
      "dedup_source_overlap_incremental", "dedup_substring_coverage",
      "dedup_allpairs_jaccard", "events_overlapping_stays", "dedup_scrub_spans")
    val spark = graft.GraftSession()
    implicit val s: SparkSession = spark

    def timeOne(name: String, aqe: Boolean): (Double, Seq[String]) = {
      val q = graft.SparkEntry.registry(name)
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try {
        var best = Double.MaxValue
        var rows: Seq[String] = Nil
        for (i <- 1 to 2) {
          Cached.releaseAll(); spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = q.fn(spark, dir)
          df.write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt < best) best = dt
          if (i == 1) {
            val sorted = if (q.sort.nonEmpty) df.orderBy(q.sort: _*) else df
            rows = sorted.collect().map(_.toString).toSeq
          }
        }
        (best, rows)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // session warmup
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    graft.plans.VectorExpressions.register(spark)
    names.foreach { n =>
      try {
        val warm = timeOne(n, aqe = true) // absorbs stage builds
        val (on, ron) = timeOne(n, aqe = true)
        val (off, roff) = timeOne(n, aqe = false)
        val eq = ron == roff
        System.err.println(f"[probe] $n%-35s on=$on%7.2f off=$off%7.2f ratio=${off / on}%5.2f equal=$eq")
        if (!eq) System.err.println(s"[probe]   MISMATCH rows on=${ron.size} off=${roff.size}")
      } catch { case e: Throwable => System.err.println(s"[probe] $n FAILED: $e") }
    }
    spark.stop()
  }
}
