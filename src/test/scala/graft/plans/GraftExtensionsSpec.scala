package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_cosine resolves via SparkSessionExtensions-style registration") {
    // the shared test session wasn't built with extensions; install the
    // same builder both paths share and resolve through SQL
    val spark = TestSpark.spark
    VectorExpressions.register(spark)
    val v = spark.sql(
      """SELECT graft_cosine(
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |  array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(v - 24.0 / 25.0) < 1e-12)
  }

  test("GraftSession builds with GraftExtensions and resolves graft_cosine") {
    // getOrCreate reuses the shared context but applies extension injections
    val s = graft.GraftSession()
    val v = s.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(v == 1.0)
  }
}
