package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("uncapped trianglesCapped reproduces the exact per-part counts") {
    val exact = counts(GraphQueries.triangles(spark, dir)) // top-100 view
    val full = counts(GraphQueries.trianglesCapped(spark, dir, Int.MaxValue))
    assert(exact.nonEmpty)
    // the registered query is the top-100 slice of the full counts
    exact.foreach { case (k, v) => assert(full(k) == v, s"part $k") }
  }

  test("whale cap only ever undercounts, and monotonically in the cap") {
    val full = counts(GraphQueries.trianglesCapped(spark, dir, Int.MaxValue))
    val c8 = counts(GraphQueries.trianglesCapped(spark, dir, 8))
    val c32 = counts(GraphQueries.trianglesCapped(spark, dir, 32))
    assert(c8.nonEmpty)
    c8.foreach { case (k, v) => assert(v <= c32(k), s"cap 8 beat cap 32 on part $k") }
    c32.foreach { case (k, v) => assert(v <= full(k), s"cap overcounted part $k") }
    assert(c8.values.sum <= c32.values.sum && c32.values.sum <= full.values.sum)
  }
}
