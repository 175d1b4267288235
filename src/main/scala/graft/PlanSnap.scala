package graft

/** Writes `.explain("formatted")` of named registered queries to files —
  * the before/after plan evidence for the optimization rounds.
  *
  * {{{
  * sbt "runMain graft.PlanSnap /root/testdata/sf0.01 plans/r14 _before graph_hits ..."
  * }}}
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <sfDir> <outDir> <suffix> [query...]")
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else SparkEntry.registry.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(out)
    val spark = GraftSession()
    names.foreach { n =>
      val q = SparkEntry.registry.getOrElse(n, sys.error(s"unknown query $n"))
      val txt = q.fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"$n$suffix.txt"), txt.getBytes("UTF-8"))
      System.err.println(s"[plansnap] wrote $n$suffix.txt")
      graft.operators.Cached.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
