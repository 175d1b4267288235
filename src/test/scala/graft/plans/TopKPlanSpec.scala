package graft.plans

import graft.TestSpark
import graft.operators.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the custom TopKPerKey operator (LogicalPlan + Strategy +
  * bounded-heap SparkPlan) against the two-phase aggregate formulation. */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scored(n: Int) = (1 to n).map { i =>
    (i % 9L, (i * 37 % 50) / 50.0, i.toLong) // many score ties per key
  }.toDF("probe_id", "cos", "vec_id").repartition(8)

  test("custom operator matches the two-phase aggregate, ties included") {
    val df = scored(2000)
    val got = TopK.perKeyExec(df, "probe_id", "cos", "vec_id", 5)
      .orderBy("probe_id", "rank").collect().toSeq
    val want = TopK.perKey(df, "probe_id", "cos", "vec_id", 5)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(got == want)
  }

  test("k larger than group size returns the whole group, ranked") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.8, 11L), (2L, 0.5, 20L))
      .toDF("probe_id", "cos", "vec_id")
    val got = TopK.perKeyExec(df, "probe_id", "cos", "vec_id", 5)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8), (2L, 1L, 20L, 0.5)))
  }

  test("rows with NULL score or id are skipped, never ranked as 0") {
    val df = Seq(
      (1L, Option(0.2), Option(10L)),
      (1L, None, Option(11L)),          // null score: would win if read as 0.0? no — skipped
      (1L, Option(-0.5), Option(12L)),  // negative score must outrank a null, proving null != 0.0
      (1L, Option(0.9), None),          // null id: skipped
      (2L, None, None)                  // whole key is null-only: key absent from output
    ).toDF("probe_id", "cos", "vec_id")
    val got = TopK.perKeyExec(df, "probe_id", "cos", "vec_id", 5)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 10L, 0.2), (1L, 2L, 12L, -0.5)))
  }

  test("physical plan is partial -> exchange -> final (map-side bounded)") {
    val df = scored(500)
    val plan = TopK.perKeyExec(df, "probe_id", "cos", "vec_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("PartialTopK"), plan)
    val fi = plan.indexOf("FinalTopK"); val ex = plan.indexOf("Exchange", fi)
    val pi = plan.indexOf("PartialTopK", fi)
    assert(fi >= 0 && ex > fi && pi > ex, s"expected Final above Exchange above Partial:\n$plan")
  }
}
