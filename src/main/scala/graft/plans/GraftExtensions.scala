package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension wiring for graft's native expressions
  * (SURVEY §4: `graft.plans` registers through SparkSessionExtensions).
  *
  * Preferred install path:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or config-only (works with spark-submit / Connect server):
  *   // spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  * [[VectorExpressions.register]] remains for sessions built elsewhere
  * (e.g. the driver's own harness) — both routes resolve to the same
  * Catalyst expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_hex_prefix"),
      new ExpressionInfo(classOf[HexPrefix].getName, "graft_hex_prefix"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HexPrefix(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    // SQL self-join → BandedPairs rewrite + its planning strategy
    e.injectOptimizerRule(_ => BandedPairsRewrite)
    e.injectPlannerStrategy(_ => BandedPairsStrategy)
  }
}
