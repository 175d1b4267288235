package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The media-hygiene quartet (content-addressed dedup, integrity scan,
  * cross-video frame dedup, perceptual-bucket candidates), each pinned
  * against a driver recompute over the raw payload bytes — hex/digest
  * arithmetic re-derived with java.security directly.
  */
class MultimodalHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def fmt(id: Long): String =
    if (id % 3 == 0) "png" else if (id % 3 == 1) "jpeg" else "webp"

  private lazy val docs: Array[(Long, Long, String)] =
    graft.sources.Tables(dir)(spark).documents
      .selectExpr("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("content-addressed dedup matches the per-format storage recompute") {
    val groups = docs.groupBy(d => (fmt(d._1), md5hex(d._3), d._3.getBytes("UTF-8").length))
    val expect = groups.toSeq.groupBy(_._1._1).toSeq.map { case (f, gs) =>
      val nFiles = gs.map(_._2.length).sum.toLong
      val nDistinct = gs.size.toLong
      val bt = gs.map { case ((_, _, nb), ds) => BigInt(nb) * ds.length }.sum
      val bs = gs.map { case ((_, _, nb), _) => BigInt(nb) }.sum
      (f, nFiles, nDistinct, (nFiles - nDistinct) * 1000 / nFiles,
        bt.toLong, (bt - bs).toLong)
    }.sortBy(_._1)
    val got = MultimodalQueries.queries("mm_exact_dedup").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 3)
  }

  test("integrity scan matches the metadata-predicate recompute") {
    val expect = docs.groupBy(d => fmt(d._1)).toSeq.map { case (f, ds) =>
      val checks = ds.map { case (id, nChars, text) =>
        val nb = text.getBytes("UTF-8").length.toLong
        val w = 64 + (id % 8) * 32; val h = 64 + (id % 5) * 48
        val nf = (nChars % 30) + 1
        (nb == 0, nb < (w * h) / 512, nf > nb / 64 + 1)
      }
      (f, ds.length.toLong, checks.count(_._1).toLong, checks.count(_._2).toLong,
        checks.count(_._3).toLong,
        checks.count(c => c._1 || c._2 || c._3).toLong,
        checks.count(c => c._1 || c._2 || c._3).toLong * 1000 / ds.length)
    }.sortBy(_._1)
    val got = MultimodalQueries.queries("mm_corrupt_scan").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.size == 3)
    // the synthetic corpus is non-degenerate: some files flag, most don't
    assert(got.map(_._6).sum > 0 && got.forall(t => t._7 < 1000))
  }

  private def frameHashes(text: String): Seq[String] = {
    val hx = text.getBytes("UTF-8").map("%02X".format(_)).mkString
    val n = math.min((hx.length + 63) / 64, 8)
    (0 until n).map(i => md5hex(hx.substring(i * 64, math.min(i * 64 + 64, hx.length))))
  }

  test("frame dedup finds exactly the frame hashes shared across videos") {
    val frames = docs.filter(_._1 % 3 == 2)
      .flatMap { case (id, _, text) => frameHashes(text).map(h => (h, id)) }
    val expect = frames.groupBy(_._1).toSeq
      .map { case (h, fs) =>
        (h, fs.map(_._2).distinct.length.toLong, fs.length.toLong, fs.map(_._2).min)
      }
      .filter(_._2 > 1).sortBy(_._1)
    val got = MultimodalQueries.queries("mm_frame_dedup").fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
  }

  test("phash buckets match the quartile-energy signature recompute") {
    val sigs = docs.flatMap { case (id, _, text) =>
      val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
      val nb = bytes.length.toLong
      if (nb < 4) None
      else {
        val nb4 = (nb / 4).toInt
        val qs = (0 until 4).map(k => bytes.slice(k * nb4, (k + 1) * nb4).sum)
        val total = qs.sum
        val lv = qs.map(q => math.min(7L, (q * 16) / (total + 1)))
        Some((id, (nb / 64) * 4096 + lv(0) * 512 + lv(1) * 64 + lv(2) * 8 + lv(3)))
      }
    }
    val expect = sigs.groupBy(_._2).toSeq
      .map { case (sig, ds) =>
        (sig, ds.length.toLong, ds.map(_._1).min, ds.length.toLong * (ds.length - 1) / 2)
      }
      .filter(_._2 > 1).sortBy(_._1)
    val got = MultimodalQueries.queries("mm_phash_buckets").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // bucketing is sub-quadratic: candidate pairs a small fraction of all pairs
    val allPairs = sigs.length.toLong * (sigs.length - 1) / 2
    assert(got.map(_._4).sum * 10 < allPairs)
  }
}
