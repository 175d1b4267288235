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

  test("render mentions every flagged and missing query") {
    val current = anchors + ("q_d" -> 40.0, "q_a" -> -1.0)
    val out = BenchGuard.render(BenchGuard.evaluate(anchors, current))
    assert(out.contains("REGRESSION q_d"))
    assert(out.contains("MISSING q_a"))
  }
}
