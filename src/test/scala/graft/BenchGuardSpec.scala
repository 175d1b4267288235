package graft

import org.scalatest.funsuite.AnyFunSuite

/** The regression guard's comparison logic on synthetic timings — the
  * whole point is that box drift alone never flags, and a genuine
  * per-query blowup always does. */
class BenchGuardSpec extends AnyFunSuite {

  private val anchors = Map(
    "q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.5, "q_d" -> 4.0, "q_e" -> 1.5)

  test("uniform box slowdown is absorbed by the drift factor") {
    val slowBox = anchors.map { case (k, v) => k -> v * 1.8 } // 1.8x everything
    val r = BenchGuard.evaluate(anchors, slowBox)
    assert(r.ok)
    assert(math.abs(r.driftFactor - 1.8) < 1e-9)
    assert(r.comparedCount == 5)
  }

  test("a single 5x regression is flagged even on a drifted box") {
    val current = anchors.map { case (k, v) => k -> v * 1.5 } + ("q_d" -> 4.0 * 7.5)
    val r = BenchGuard.evaluate(anchors, current)
    assert(r.flagged.map(_._1) == Seq("q_d"))
    val ratio = r.flagged.head._4
    assert(ratio > 2.0 && ratio < 6.0) // 7.5x raw over ~1.5x drift
  }

  test("sub-floor noise is never flagged; failed queries surface as missing") {
    // q_c: 0.5s -> 0.9s is 1.8x the drifted anchor but under the 1s floor
    val current = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.9, "q_d" -> 4.0, "q_e" -> -1.0)
    val r = BenchGuard.evaluate(anchors, current)
    assert(r.flagged.isEmpty)
    assert(r.missing == Seq("q_e"))
    assert(!r.ok)
  }

  test("unanchored new queries are ignored; empty overlap degrades gracefully") {
    val r = BenchGuard.evaluate(Map("gone" -> 1.0), Map("new_q" -> 3.0))
    assert(r.comparedCount == 0 && r.driftFactor == 1.0 && r.missing == Seq("gone"))
  }

  test("anchor JSON round-trips through the parser") {
    val m = BenchGuard.parseAnchors("""{ "q_a": 1.25, "q_b":0.5 }""")
    assert(m == Map("q_a" -> 1.25, "q_b" -> 0.5))
  }

  test("family drift: one family's slowdown never excuses another family's regression") {
    // 6 relational + 6 ann anchored queries at 1s each
    val anch = ((1 to 6).map(i => s"q_r$i" -> 1.0) ++
      (1 to 6).map(i => s"ann_$i" -> 1.0)).toMap
    // relational family drifted 3x (box contention); ann family flat except
    // ann_1, which regressed 2.5x — under the GLOBAL median (≈1.75-3x mixed)
    // the flat evaluate could absorb it, per-family must flag it
    val current = ((1 to 6).map(i => s"q_r$i" -> 3.0) ++
      (2 to 6).map(i => s"ann_$i" -> 1.0)).toMap + ("ann_1" -> 2.5)
    val r = BenchGuard.evaluateByFamily(anch, current)
    assert(r.flagged.map(_._1) == Seq("ann_1"))
    assert(math.abs(r.familyDrift("relational") - 3.0) < 1e-9)
    assert(math.abs(r.familyDrift("ann") - 1.0) < 1e-9)
    // ...and the relational 3x slowdown alone is NOT flagged
    assert(!r.flagged.exists(_._1.startsWith("q_r")))
  }

  test("family drift: small families fall back to the global median") {
    val anch = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("mm_binary" -> 1.0)).toMap
    val current = ((1 to 6).map(i => s"q_r$i" -> 2.0) :+ ("mm_binary" -> 2.0)).toMap
    val r = BenchGuard.evaluateByFamily(anch, current)
    assert(r.ok)
    // misc has 1 member < minFamily → uses global drift (2.0), so not flagged
    assert(math.abs(r.familyDrift("misc") - 2.0) < 1e-9)
  }

  test("family classification covers the registry's name prefixes") {
    assert(BenchGuard.family("q1_pricing_summary") == "relational")
    assert(BenchGuard.family("q_tree_rollup") == "relational")
    assert(BenchGuard.family("q13_order_count_dist") == "relational")
    assert(BenchGuard.family("text_lang_id") == "text")
    assert(BenchGuard.family("docs_quality_filter") == "text")
    assert(BenchGuard.family("dedup_minhash_lsh") == "dedup")
    assert(BenchGuard.family("ann_ivfpq_trained") == "ann")
    assert(BenchGuard.family("csr_eav_melt") == "csr")
    assert(BenchGuard.family("events_sessionize") == "events")
    assert(BenchGuard.family("mm_frame_sample") == "misc")
    assert(BenchGuard.family("zone_map_stats") == "misc")
  }

  test("render mentions every flagged and missing query") {
    val current = anchors + ("q_d" -> 40.0, "q_a" -> -1.0)
    val out = BenchGuard.render(BenchGuard.evaluate(anchors, current))
    assert(out.contains("REGRESSION q_d"))
    assert(out.contains("MISSING q_a"))
  }

  test("adjudicate: isolated re-run under threshold reports ordering noise") {
    // anchor 2.0s, sweep 10.0s (flagged at drift 1.0); isolated 2.5s → noise
    val anch = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("q_slow" -> 2.0)).toMap
    val current = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("q_slow" -> 10.0)).toMap
    val r = BenchGuard.evaluateByFamily(anch, current)
    assert(r.flagged.map(_._1) == Seq("q_slow"))
    val verdicts = BenchGuard.adjudicate(r, _ => 2.5)
    assert(verdicts.map(v => (v.query, v.confirmed)) == Seq(("q_slow", false)))
    assert(BenchGuard.renderAdjudication(verdicts).contains("ORDERING-NOISE q_slow"))
  }

  test("adjudicate: isolated re-run still over threshold confirms; rerun uses family drift") {
    // relational family drifted 2x; q_slow isolated at 9.0 vs drifted anchor
    // 2.0*2.0=4.0 → ratio 2.25 > 2.0 → confirmed
    val anch = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("q_slow" -> 2.0)).toMap
    val current = ((1 to 6).map(i => s"q_r$i" -> 2.0) :+ ("q_slow" -> 20.0)).toMap
    val r = BenchGuard.evaluateByFamily(anch, current)
    assert(r.flagged.map(_._1) == Seq("q_slow"))
    val verdicts = BenchGuard.adjudicate(r, _ => 9.0)
    assert(verdicts.head.confirmed)
    assert(math.abs(verdicts.head.isolatedRatio - 2.25) < 1e-9)
    assert(BenchGuard.renderAdjudication(verdicts).contains("REGRESSION-CONFIRMED q_slow"))
  }

  test("adjudicate: a failed isolated re-run (-1) is always confirmed") {
    val anch = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("q_slow" -> 2.0)).toMap
    val current = ((1 to 6).map(i => s"q_r$i" -> 1.0) :+ ("q_slow" -> 10.0)).toMap
    val r = BenchGuard.evaluateByFamily(anch, current)
    val verdicts = BenchGuard.adjudicate(r, _ => -1.0)
    assert(verdicts.head.confirmed)
  }
}
