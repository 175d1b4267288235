package graft.functions

/** LSH banding planner (SURVEY §8 candidate (f)).
  *
  * For a minhash signature split into `b` bands of `r` rows, a pair with
  * Jaccard similarity s collides in at least one band with probability
  * 1 - (1 - s^r)^b; the S-curve's midpoint is approximately
  * (1/b)^(1/r). Given a target similarity threshold and a signature
  * budget, pick the (bands, rows) whose midpoint lands closest to the
  * target — raising the threshold trades recall near the boundary for
  * fewer candidate pairs, which at corpus scale is the knob that keeps
  * the band-bucket self-join linear.
  *
  * [[graft.operators.DedupQueries]]'s fixed B=4 × R=3 is `plan(0.63, 12)`;
  * a pipeline that samples its corpus (e.g. the observed near-dup Jaccard
  * distribution) re-plans with the measured target instead.
  */
object Lsh {

  /** S-curve midpoint of a (bands, rows) split. */
  def threshold(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  /** Collision probability of a pair with Jaccard `s`. */
  def collisionProbability(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Best (bands, rows) with bands·rows ≤ maxSignature for a target
    * threshold; ties prefer the larger signature (sharper S-curve). */
  def plan(targetThreshold: Double, maxSignature: Int): (Int, Int) = {
    require(targetThreshold > 0 && targetThreshold < 1, "threshold must be in (0,1)")
    require(maxSignature >= 2, "need at least a 2-hash signature")
    val candidates = for {
      b <- 1 to maxSignature
      r <- 1 to maxSignature / b
      if b * r >= 2
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      (math.abs(threshold(b, r) - targetThreshold), -(b * r))
    }
  }
}
