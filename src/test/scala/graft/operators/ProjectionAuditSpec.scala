package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** JL projection audit pinned against a driver recompute: the md5 sign
  * matrix, the left-associative projection chains, the float cast, and
  * the integer error aggregation. */
class ProjectionAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = d.digest(s"$j:$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }
  private def project(v: Array[Float]): Array[Float] =
    (0 until 16).map { j =>
      var acc = 0.0
      if (sign(j, 0) > 0) acc = v(0).toDouble else acc = 0.0 - v(0).toDouble
      for (i <- 1 until 64)
        acc = if (sign(j, i) > 0) acc + v(i).toDouble else acc - v(i).toDouble
      acc.toFloat
    }.toArray
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  /** The fixed-budget hash-rank draw (lowest-n by salted md5). */
  private def pick(vecs: Array[(Long, Array[Float])], salt: String, n: Int) =
    vecs.sortBy { case (id, _) => (md5hex(salt + id), id) }.take(n)

  test("distortion table matches the driver projection on the fixed-budget draws") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val corpus = pick(vecs, "graft-proj-sample:", 400)
    val probes = pick(vecs, "graft-proj-probe:", 40)
    // the draw budgets bound the pair stage at any corpus size
    assert(corpus.length <= 400 && probes.length <= 40)
    val expect = probes.map { case (pid, q) =>
      val qp = project(q)
      val errs = corpus.filter(_._1 != pid).map { case (_, v) =>
        val e = math.abs(r6(cos(v, q)) - r6(cos(project(v), qp))) * 1000000
        BigDecimal(e).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (pid, errs.length.toLong, errs.sum / errs.length, errs.max)
    }.toSeq.sortBy(_._1)
    val got = ProjectionQueries.projectionAudit(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect && got.nonEmpty)
    // a 4x compression distorts, but cosine stays in range: errors < 2e6
    assert(got.forall(_._4 < 2000000L))
  }
}
