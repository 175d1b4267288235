package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The canonical output ordering lives HERE (Q.sort), not in the operators:
  * a global sort purely for compare-stability is a harness concern — at
  * 100 TB an operator ending in a full-cluster sort of its entire output
  * would be a scale bug, and the engine's plans must not carry it. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev-only name filter: Verify <sf> <out> [query ...]
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's session factory — correctness runs on the same AQE +
    // broadcast configuration deployments and benchmarks use
    val spark = GraftSession(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    // fail fast (one named error) if the driver's testdata vintage changed
    // shape, instead of 150 per-query analysis errors
    graft.sources.Tables(sfDir)(spark).assertVintage()
    new java.io.File(outDir).mkdirs()
    // per-query outcome map for the final-line JSON (r12 verdict #6: the
    // driver-side CORRECTNESS artifact came back empty two rounds running;
    // this gives its scrape a BENCH-style machine-readable last line —
    // rows written per query, plus the failed set)
    val outcome = scala.collection.mutable.TreeMap.empty[String, Long]
    val failed = scala.collection.mutable.TreeSet.empty[String]
    SparkEntry.registry
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, q) =>
      try {
        val df = q.fn(spark, sfDir)
        val sorted = if (q.sort.nonEmpty) df.orderBy(q.sort: _*) else df
        sorted.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // parquet footer count — metadata-only, no second execution
        outcome(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      } finally {
        // release operator-persisted intermediates (the Cached contract):
        // a 150+ query dump would otherwise accumulate every edge list and
        // session frame in executor memory for the whole run
        graft.operators.Cached.releaseAll()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ONE machine-readable summary line (the Bench stdout contract)
    println(s"""{"metric":"verify","sf":${q(sfDir)},"out":${q(outDir)},""" +
      s""""n_ok":${outcome.size},"n_failed":${failed.size},""" +
      s""""failed":${failed.map(q).mkString("[", ",", "]")},""" +
      s""""rows":${outcome.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
