package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup pinned against a full driver recompute of the
  * window hashing, the corpus-wide multiplicity, and the diagonal
  * island assembly — plus the completeness property that makes window
  * hashing a sound substitute for the suffix array at the W-token
  * threshold. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val W = 8

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** (doc_id, pos, windowHash) for every W-token window, stride 1. */
  private lazy val wins: Seq[(Long, Int, String)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.toSeq.flatMap { case (id, text) =>
      val w = text.split("\\s+").filter(_.nonEmpty)
      if (w.length < W) Nil
      else (0 to w.length - W).map(p => (id, p, md5hex(w.slice(p, p + W).mkString(" "))))
    }
  }
  private lazy val mult: Map[String, Int] =
    wins.groupBy(_._3).view.mapValues(_.size).toMap

  test("coverage census matches the multiplicity recompute") {
    val expect = wins.groupBy(_._1).toSeq.map { case (id, ws) =>
      val dup = ws.count(t => mult(t._3) > 1).toLong
      (id, ws.size.toLong, dup, dup * 1000 / ws.size)
    }.sortBy(_._1)
    val got = SubstringDedup.queries("dedup_substring_coverage").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
  }

  test("runs match the diagonal-island recompute and reassemble maximal spans") {
    val rare = wins.filter(t => { val m = mult(t._3); m >= 2 && m <= 8 })
    val byHash = rare.groupBy(_._3)
    val pairs = byHash.values.flatMap { hs =>
      for { a <- hs; b <- hs if a._1 < b._1 } yield (a._1, b._1, a._2, b._2)
    }.toSeq
    val expect = pairs.groupBy { case (da, db, pa, pb) => (da, db, pa - pb) }
      .toSeq.flatMap { case ((da, db, _), ps) =>
        // islands: consecutive pa values collapse
        val sorted = ps.map(p => (p._3, p._4)).sortBy(_._1)
        val islands = sorted.foldLeft(List.empty[List[(Int, Int)]]) {
          case (acc @ (cur :: rest), p) if p._1 == cur.head._1 + 1 => (p :: cur) :: rest
          case (acc, p) => List(p) :: acc
        }
        islands.map { isl =>
          val n = isl.size.toLong
          (da, db, isl.last._1.toLong, isl.last._2.toLong, n, n + W - 1)
        }
      }.sortBy(t => (t._1, t._2, t._3, t._4))
    val got = SubstringDedup.queries("dedup_substring_runs").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(t => (t._1, t._2, t._3, t._4))
    assert(got == expect && got.nonEmpty)
    // a run of n windows is an (n+W-1)-token span, and both docs really
    // carry the identical span — re-extract and compare the text
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty))).toMap
    got.foreach { case (da, db, sa, sb, _, len) =>
      val spanA = docs(da).slice(sa.toInt, sa.toInt + len.toInt).mkString(" ")
      val spanB = docs(db).slice(sb.toInt, sb.toInt + len.toInt).mkString(" ")
      assert(spanA == spanB && spanA.nonEmpty)
    }
  }

  test("completeness: every duplicated span of >= W tokens registers in the census") {
    // plant the invariant's logic: if a W-window hash is unique, no
    // >=W-token span through that position is duplicated; conversely any
    // doc pair sharing a W-token sequence must share its window hash
    val dupPositions = wins.filter(t => mult(t._3) > 1)
    val got = SubstringDedup.queries("dedup_substring_coverage").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expectPerDoc = dupPositions.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    wins.map(_._1).distinct.foreach { id =>
      assert(got(id) == expectPerDoc.getOrElse(id, 0L))
    }
  }
}
