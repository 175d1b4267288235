package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Margin-based bitext mining pinned against a full driver recompute:
  * the IVF candidate pruning (shared centroid set, argmax assignment,
  * 2-cluster probing), the integer-micros cosine scaling, the fwd/bwd
  * top-k neighborhood sums, and the ratio-margin division. */
class BitextMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def micros(x: Double): Long =
    BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("mined pairs match the driver margin pipeline") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val cents = vecs.filter(_._1 < 8).toSeq.sortBy(_._1).map(_._2)
    def centCos(v: Array[Float]) = cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }

    val tgt = vecs.toSeq.filter { case (id, _) => langs(id) == "en" }
      .map { case (id, v) => (id, v, centCos(v).maxBy { case (c, i) => (c, -i) }._2) }
    val src = vecs.toSeq.filter { case (id, _) => langs(id) != "en" }
      .flatMap { case (id, v) =>
        centCos(v).sortBy { case (c, i) => (-c, i) }.take(2)
          .map { case (_, cl) => (id, langs(id), v, cl) }
      }
    val cand = for {
      (sid, lang, sv, scl) <- src
      (tid, tv, tcl) <- tgt if scl == tcl
      cu = micros(cos(sv, tv)) if cu > 0
    } yield (sid, lang, tid, cu)

    val fwd = cand.groupBy(_._1).map { case (sid, cs) =>
      val top = cs.sortBy(c => (-c._4, c._3)).take(4)
      (sid, top.head, top.map(_._4).sum)
    }
    val bwdSum = cand.groupBy(_._3).map { case (tid, cs) =>
      tid -> cs.sortBy(c => (-c._4, c._1)).take(4).map(_._4).sum
    }
    val expect = fwd.toSeq.flatMap { case (sid, best, fsum) =>
      val margin = best._4 * 8000000L / (fsum + bwdSum(best._3))
      if (margin >= 1000000L) Some((best._2, sid, best._3, best._4, margin)) else None
    }.sortBy(t => (t._1, t._2))

    val got = BitextQueries.minedPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect && got.nonEmpty)
    // a mined pair is one source doc's single best match, above margin 1.0
    assert(got.map(_._2).distinct.size == got.size)
    assert(got.forall(t => t._1 != "en" && t._5 >= 1000000L))
  }

  test("the serving twin replayed over the full corpus equals the batch query") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(dir)(spark)
    graft.plans.VectorExpressions.register(spark)
    val batch = t.embeddings
      .join(t.documents.select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id"))
      .where(col("lang") =!= "en")
      .withColumn("norm", sqrt(graft.plans.VectorExpressions.dot(col("embedding"), col("embedding"))))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(x => (x._1, x._2))
    val served = rows(BitextQueries.mineBatch(spark, dir, batch))
    val full = rows(BitextQueries.minedPairs(spark, dir))
    assert(served == full && served.nonEmpty)
  }
}
