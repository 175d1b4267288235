package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** SQL reachability for [[BandedPairs]] (SURVEY §8b (h)) — not as a new
  * function surface but as an optimizer rewrite: `spark.sql` users keep
  * writing the canonical bucket self-join
  *
  * {{{
  *   SELECT DISTINCT a.id, b.id
  *   FROM bands a JOIN bands b
  *     ON a.k1 = b.k1 [AND a.k2 = b.k2 ...] AND a.id < b.id
  * }}}
  *
  * and the plan silently becomes the custom one-exchange streaming-pairs
  * exec instead of a self-join (two reads of the banded table, hash build
  * + probe, wide matched rows). The rewrite fires only when it is
  * provably result-identical:
  *
  *  - both join inputs are the same plan (`sameResult`), inner join;
  *  - the condition is exactly positional key equalities plus one strict
  *    `<` on a long id column (no residual conjuncts);
  *  - pair multiplicity cannot diverge: either a dedup sits directly
  *    above (DISTINCT → Aggregate by this point in optimization), or the
  *    join input is itself duplicate-free (a DISTINCT-shaped Aggregate) —
  *    BandedPairs collapses duplicate ids inside one bucket where a raw
  *    self-join would multiply them, so without one of the two guards the
  *    rewrite would change row counts;
  *  - bucket keys contain no floats (binary-equality vs SQL-equality on
  *    -0.0/NaN — [[BandedPairs]] rejects them by require).
  *
  * Disable per-session with `SET spark.graft.rewrite.bandedPairs=false`.
  */
object BandedPairsRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rewrite.bandedPairs"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  /** Install into a session built without `spark.sql.extensions` (the
    * rule into extraOptimizations, the strategy into extraStrategies).
    * Idempotent. */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(BandedPairsStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ BandedPairsStrategy
    if (!classic.experimental.extraOptimizations.contains(BandedPairsRewrite))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ BandedPairsRewrite
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else
    plan.transformUp {
      // DISTINCT <exprs of the two ids> FROM t a JOIN t b — a full dedup
      // directly above the join absorbs any multiplicity difference
      // (DISTINCT over f(pairs-with-multiplicity) == DISTINCT over
      // f(pair-set) for any f)
      case agg @ Aggregate(group, aggExprs, j: Join, _) =>
        matchSelfJoin(j).flatMap { m =>
          if (fullyDedups(group, aggExprs) && aggExprs.forall(onlyIds(_, m)))
            Some(agg.copy(child = bridge(m)))
          else None
        }.getOrElse(agg)
      // same with the projection still sitting between (CollapseProject
      // does not always fold it into the aggregate)
      case agg @ Aggregate(group, aggExprs, proj @ Project(projList, j: Join), _) =>
        matchSelfJoin(j).flatMap { m =>
          if (fullyDedups(group, aggExprs) && projList.forall(onlyIds(_, m)))
            Some(agg.copy(child = proj.copy(child = bridge(m))))
          else None
        }.getOrElse(agg)
      // plain projection of the pair columns: safe only when the join
      // input is already duplicate-free
      case proj @ Project(projList, j: Join) =>
        matchSelfJoin(j).flatMap { m =>
          if (distinctShaped(m.child) && projList.forall(onlyIds(_, m)))
            Some(proj.copy(child = bridge(m)))
          else None
        }.getOrElse(proj)
    }

  /** A recognized self-join: child plan, the two id attrs (left `<`
    * right), and the left-side bucket key attrs. */
  private case class Match(child: LogicalPlan, lId: Attribute, rId: Attribute,
      keys: Seq[Attribute])

  private def matchSelfJoin(j: Join): Option[Match] = {
    if (j.joinType != Inner || j.condition.isEmpty) return None
    val (l, r) = (j.left, j.right)
    if (!l.sameResult(r) || l.output.length != r.output.length) return None
    def lPos(a: Attribute) = l.output.indexWhere(_.exprId == a.exprId)
    def rPos(a: Attribute) = r.output.indexWhere(_.exprId == a.exprId)
    var keyPos = Vector.empty[Int]
    var idPos = -1
    splitConjunctivePredicates(j.condition.get).foreach {
      case EqualTo(x: Attribute, y: Attribute) if lPos(x) >= 0 && rPos(y) >= 0 && lPos(x) == rPos(y) =>
        keyPos :+= lPos(x)
      case EqualTo(y: Attribute, x: Attribute) if lPos(x) >= 0 && rPos(y) >= 0 && lPos(x) == rPos(y) =>
        keyPos :+= lPos(x)
      case LessThan(x: Attribute, y: Attribute) if idPos < 0 && lPos(x) >= 0 && rPos(y) >= 0 && lPos(x) == rPos(y) =>
        idPos = lPos(x)
      case GreaterThan(y: Attribute, x: Attribute) if idPos < 0 && lPos(x) >= 0 && rPos(y) >= 0 && lPos(x) == rPos(y) =>
        idPos = lPos(x)
      case _ => return None
    }
    val keys = keyPos.distinct.map(l.output)
    if (idPos < 0 || keys.isEmpty || keyPos.contains(idPos)) return None
    val lId = l.output(idPos)
    if (lId.dataType != LongType) return None
    if (keys.exists(k => BandedPairs.containsFloat(k.dataType))) return None
    Some(Match(l, lId, r.output(idPos), keys))
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case other => other
  }

  /** The aggregate is a pure DISTINCT: no aggregate functions, and the
    * grouping exprs and output exprs are the same set — so the node
    * collapses row multiplicity completely. */
  private def fullyDedups(group: Seq[Expression], aggExprs: Seq[NamedExpression]): Boolean =
    group.nonEmpty &&
      aggExprs.forall(ae => ae.collectFirst {
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ()
      }.isEmpty) &&
      aggExprs.forall(ae => group.exists(_.semanticEquals(stripAlias(ae)))) &&
      group.forall(g => aggExprs.exists(ae => stripAlias(ae).semanticEquals(g)))

  /** The expression references nothing but the two id attrs (so it stays
    * valid over the bridge projection). */
  private def onlyIds(e: Expression, m: Match): Boolean =
    e.references.forall(a => a.exprId == m.lId.exprId || a.exprId == m.rId.exprId)

  /** DISTINCT-shaped aggregate: plain attrs, groupings == output. */
  private def distinctShaped(p: LogicalPlan): Boolean = p match {
    case Aggregate(g, a, _, _) =>
      a.forall(_.isInstanceOf[Attribute]) &&
        g.forall(_.isInstanceOf[Attribute]) &&
        g.collect { case x: Attribute => x.exprId }.toSet ==
          a.collect { case x: Attribute => x.exprId }.toSet
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) => distinctShaped(child)
    case _ => false
  }

  /** BandedPairs + a projection that re-exposes its (id_a, id_b) under
    * the original join-output exprIds, so parents rebind unchanged. */
  private def bridge(m: Match): LogicalPlan = {
    val bp = BandedPairs(m.keys, m.lId, 0, m.child)
    Project(Seq(
      Alias(bp.idA, m.lId.name)(exprId = m.lId.exprId),
      Alias(bp.idB, m.rId.name)(exprId = m.rId.exprId)), bp)
  }
}
