package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Audience segment algebra and the view×click attention-window overlap,
  * pinned against first-principles driver recomputes: per-user flag sets
  * rebuilt from raw tuples, and the interval intersection recomputed by
  * the direct merge-then-pair-overlap algorithm (no day decomposition) —
  * so the engine's (key, day) block machinery is checked against a
  * structurally different formulation, same as the DuckDB oracle but in
  * process and rank-exact. */
class SegmentOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private lazy val ev: Array[(Long, Long, String, Long)] =
    graft.sources.Tables(dir)(spark).events
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("segment algebra matches the per-user flag recompute over all 8 cells") {
    val flags = ev.groupBy(_._1).values.map { es =>
      (if (es.exists(_._3 == "view")) 1 else 0,
        if (es.exists(_._3 == "purchase")) 1 else 0,
        if (es.exists(_._3 == "error")) 1 else 0)
    }
    val expect = flags.groupBy(identity).map { case (k, g) =>
      (k._1, k._2, k._3, g.size.toLong)
    }.toSeq.sorted
    val got = EventAnalytics.queries("events_segment_algebra").fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // mass conservation: cells partition the user base
    assert(got.map(_._4).sum == ev.map(_._1).distinct.length.toLong)
  }

  /** Gap-sessionize one user's one-type stream, pad ±15 min, merge. */
  private def paddedBlocks(ts: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = ts.sorted
    val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var start = sorted.head._1; var last = sorted.head._1
    sorted.tail.foreach { case (us, _) =>
      if (us - last > 1800000000L) { sessions += ((start, last + 1)); start = us }
      last = us
    }
    sessions += ((start, last + 1))
    val padded = sessions.map { case (s, e) => (s - 900000000L, e + 900000000L) }
    // union-merge (padding can make a user's own windows overlap)
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    padded.sortBy(identity).foreach { case (s, e) =>
      if (merged.nonEmpty && s <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e))
      else merged += ((s, e))
    }
    merged.toSeq
  }

  test("view×click overlap matches the direct merge-and-intersect recompute") {
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      def side(t: String) = es.filter(_._3 == t).map(e => (e._2, e._4))
      val (vs, cs) = (side("view"), side("click"))
      if (vs.isEmpty || cs.isEmpty) None
      else {
        val ov = (for {
          (as, ae) <- paddedBlocks(vs)
          (bs, be) <- paddedBlocks(cs)
          o = math.min(ae, be) - math.max(as, bs) if o > 0
        } yield o).sum
        if (ov > 0) Some((u, ov)) else None
      }
    }.sorted
    val got = IntervalCoverage.queries("events_view_click_overlap").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expect && got.nonEmpty)
  }
}
