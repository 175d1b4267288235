package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The measured-shuffle ledger pins the PLANS.md claims to runtime
  * evidence: the zero-shuffle chunker writes zero shuffle bytes; a hash
  * aggregate does not. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String): Metrics.Ledger = {
    val q = graft.SparkEntry.registry(name)
    val (_, ledger) = Metrics.measure(spark, name) {
      q.fn(spark, TestSpark.Sf0001).write.mode("overwrite").format("noop").save()
    }
    ledger
  }

  test("zero-shuffle chunker measures zero shuffle bytes; aggregate does not") {
    val cdc = run("docs_chunk_cdc")
    assert(cdc.inputBytes > 0 && cdc.tasks > 0, cdc.toString)
    assert(cdc.shuffleWriteBytes == 0 && cdc.shuffleReadBytes == 0,
      s"the chunker's zero-shuffle plan leaked a shuffle at runtime: $cdc")
    val agg = run("q1_pricing_summary")
    assert(agg.shuffleWriteBytes > 0, s"hash aggregate must shuffle partials: $agg")
  }

  test("ledgers are per-tag: concurrent tags do not bleed into each other") {
    val a = run("text_token_stats") // map-side only
    assert(a.shuffleWriteBytes == 0, a.toString)
    val b = run("q_distinct_customers") // global distinct: must shuffle
    assert(b.shuffleWriteBytes > 0, b.toString)
  }
}
