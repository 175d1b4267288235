package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class LshSpec extends AnyFunSuite {

  test("the dedup family's fixed B=4 x R=3 is what the planner picks near 0.63") {
    assert(Lsh.plan(Lsh.threshold(4, 3), 12) == (4, 3))
  }

  test("planned split always fits the signature budget") {
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.9); k <- Seq(4, 12, 32, 128)) {
      val (b, r) = Lsh.plan(t, k)
      assert(b * r <= k && b >= 1 && r >= 1, s"t=$t k=$k -> ($b,$r)")
    }
  }

  test("higher target threshold plans more rows per band (sharper AND)") {
    val (_, rLow) = Lsh.plan(0.2, 64)
    val (_, rHigh) = Lsh.plan(0.9, 64)
    assert(rHigh > rLow)
  }

  test("collision probability is the banding S-curve, monotone in s") {
    val probs = (1 to 9).map(i => Lsh.collisionProbability(i / 10.0, 4, 3))
    assert(probs == probs.sorted)
    // at the midpoint the collision probability is substantial
    val mid = Lsh.collisionProbability(Lsh.threshold(4, 3), 4, 3)
    assert(mid > 0.5 && mid < 0.8, s"midpoint collision $mid")
  }

  test("a bigger budget never plans a worse midpoint fit") {
    for (t <- Seq(0.35, 0.5, 0.8)) {
      val small = Lsh.threshold _ tupled Lsh.plan(t, 8)
      val big = Lsh.threshold _ tupled Lsh.plan(t, 64)
      assert(math.abs(big - t) <= math.abs(small - t) + 1e-12)
    }
  }
}
