package graft

/** Plan-audit helper: prints the executed plan of the named registered
  * queries (all of them with no args) — the ".explain and iterate" loop
  * behind PLANS.md.
  *
  * {{{
  * sbt "runMain graft.PlanDump /root/testdata/sf0.01 q_cube_agg ann_lsh_cosine"
  * }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.registry.keys.toSeq.sorted
    val spark = GraftSession()
    names.foreach { n =>
      val q = SparkEntry.registry.getOrElse(n, sys.error(s"unknown query $n"))
      println(s"\n===== $n =====")
      println(q.fn(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
