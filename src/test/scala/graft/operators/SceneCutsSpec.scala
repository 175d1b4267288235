package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r11: scene-cut detection pinned against a plain-Scala recompute of the
  * frame energies (unsigned byte sums over the raw payload), the lag
  * deltas, and the per-mille threshold. */
class SceneCutsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scene cuts match the driver recompute") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs.filter(_._1 % 3 == 2).flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      if (bytes.length < 64) Nil
      else {
        val nFrames = math.min(bytes.length / 64, 12)
        val energies = (0 until nFrames).map { i =>
          bytes.slice(i * 64, i * 64 + 64).map(b => (b & 0xff).toLong).sum
        }
        energies.zipWithIndex.map { case (e, i) =>
          val d = if (i == 0) 0L
                  else math.abs(e - energies(i - 1)) * 1000 / math.max(energies(i - 1), 1L)
          (id, i.toLong, e, d, d > 40L)
        }
      }
    }.toSeq.sorted
    val got = MultimodalQueries.queries("mm_scene_cuts").fn(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq.sorted
    assert(got == expect && got.nonEmpty)
    // the threshold is exercised in both directions at this scale
    assert(got.exists(_._5) && got.exists(!_._5))
  }
}
