package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver interface: every registered query must
  * keep the conventions the correctness gate depends on (these are the
  * mistakes that silently zero a round — unordered oracles, missing
  * Verify sorts, column-name drift). */
class RegistrySpec extends AnyFunSuite {

  /** Queries allowed to omit the Verify sort (provably ≤ a handful of
    * rows, or rows-only checks). */
  private val sortExempt = Set("q_distinct_customers", "q_approx_distinct", "events_funnel",
    "events_funnel_windowed", "q14_promo_share", "q19_disjunctive_revenue", "q6_forecast_revenue",
    "events_ab_test", "ann_lsh_recall")

  test("every oracle SQL orders its output (single-row aggregates exempt)") {
    val missing = SparkEntry.registry.collect {
      case (name, q) if q.oracle.exists(sql => !sql.toUpperCase.contains("ORDER BY"))
        && !sortExempt(name) => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("every oracled query declares a Verify sort (or is exempt)") {
    val missing = SparkEntry.registry.collect {
      case (name, q) if q.oracle.isDefined && q.sort.isEmpty && !sortExempt(name) => name
    }
    assert(missing.isEmpty, s"queries without a canonical sort: $missing")
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.registry.keys.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-snake_case query names: $bad")
  }

  test("oracleSql only covers registered queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001 (driver smoke twin)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
