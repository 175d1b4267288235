package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over the whole registry: no query may GROW
  * its shuffle/sort count or acquire a cartesian vs the committed
  * `plan_anchors.json`. Shrinking is fine (improvements re-anchor via
  * `runMain graft.PlanAudit`); queries without an anchor yet are skipped
  * (they anchor at the next audit). This is BenchGuard's earlier, fully
  * deterministic sibling — a broadcast join degrading to sort-merge or a
  * lost custom operator shows up here as a diff, not as a 2× timing at
  * the next scale-up. */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no registered query regresses its plan fingerprint vs plan_anchors.json") {
    val anchors = PlanAudit.loadAnchors("plan_anchors.json")
      .getOrElse(fail("plan_anchors.json missing — run graft.PlanAudit"))
    assert(anchors.size > 150, s"suspiciously few anchors: ${anchors.size}")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.registry.toSeq.sortBy(_._1).foreach { case (name, q) =>
      anchors.get(name).foreach { a =>
        try {
          val m = PlanAudit.metrics(q.fn(spark, TestSpark.Sf0001))
          if (m.shuffles > a.shuffles)
            offenders += s"$name: shuffles ${a.shuffles} -> ${m.shuffles}"
          if (m.sorts > a.sorts)
            offenders += s"$name: sorts ${a.sorts} -> ${m.sorts}"
          if (m.cartesians > a.cartesians)
            offenders += s"$name: cartesians ${a.cartesians} -> ${m.cartesians}"
          if (m.customOps < a.customOps)
            offenders += s"$name: custom ops ${a.customOps} -> ${m.customOps} (lost an engine operator)"
        } catch {
          case e: Throwable => offenders += s"$name: plan construction failed: ${e.getMessage}"
        } finally {
          // hermetic per-query fingerprints — see PlanAudit.main's note
          graft.operators.Cached.releaseAll()
          spark.catalog.clearCache()
        }
      }
    }
    assert(offenders.isEmpty, s"plan regressions:\n  ${offenders.mkString("\n  ")}")
  }
}
