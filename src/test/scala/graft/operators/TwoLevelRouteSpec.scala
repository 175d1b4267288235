package graft.operators

import graft.TestSpark
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r11: the production two-level coarse-assignment route
  * ([[AnnQueries.assignNearest]]). Pins (a) the routing predicate — below
  * `routeAt` the column is the flat kernel argmax, bit-identical to the
  * pre-r11 family form, so every committed oracle/anchor is untouched at
  * verification scales; (b) forced-route equivalence — the parameterized
  * builder (k1 = ⌈√k⌉ groups, reps = each group's first centroid) produces
  * exactly the values of the independently composed r10 demo construction;
  * (c) the route threshold is the centroid cap, where flat assignment hits
  * its cost ceiling. */
class TwoLevelRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
  }

  private def cents(k: Int): Seq[Array[Float]] = {
    import spark.implicits._
    emb.where(col("vec_id") < k).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2).toSeq
  }

  test("route threshold is the centroid cap") {
    assert(AnnQueries.TwoLevelRouteK === AnnQueries.CentroidCap)
  }

  test("below the route: assignment is the flat kernel argmax (family unchanged)") {
    val cs = cents(8)
    val flat = {
      val cc = VectorExpressions.centroidCosines(col("embedding"), cs)
      (array_position(cc, array_max(cc)) - 1).cast("int")
    }
    val routed = AnnQueries.assignNearest(emb, cs)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = emb.withColumn("cluster", flat)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(routed === expected)
  }

  test("forced route: parameterized builder matches the independently composed two-level form") {
    // independent construction = the r10 demo's inline shape (reps, per-
    // group fine rank, CASE on the materialized group pick) written out
    // here by hand, NOT via twoLevelParts
    for (k <- Seq(9, 16)) { // 9: ⌈√9⌉=3 groups of 3; 16: 4 of 4 (toy geometry)
      val cs = cents(k)
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      val perGroup = math.ceil(k.toDouble / k1).toInt
      val nGroups = (k + perGroup - 1) / perGroup
      val reps = (0 until nGroups).map(g => cs(g * perGroup))
      val repCos = VectorExpressions.centroidCosines(col("embedding"), reps)
      val g = (array_position(repCos, array_max(repCos)) - 1).cast("int")
      val fines = (0 until nGroups).map { grp =>
        val lo = grp * perGroup
        val cc = VectorExpressions.centroidCosines(col("embedding"),
          cs.slice(lo, math.min(lo + perGroup, k)))
        (array_position(cc, array_max(cc)) - 1).cast("int") + lit(lo)
      }
      val two = fines.zipWithIndex.tail.foldLeft(fines.head) {
        case (acc, (c, grp)) => when(col("g") === grp, c).otherwise(acc)
      }
      val expected = emb.withColumn("g", g).withColumn("two", two)
        .select(col("vec_id"), col("two")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val routed = AnnQueries.assignNearest(emb, cs, out = "two", routeAt = 1)
        .select(col("vec_id"), col("two")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(routed === expected, s"k=$k")
    }
  }

  test("forced route on the whole IVF assignment agrees with flat on most of the corpus") {
    // the quantizer trade: two-level may land a vector in a different
    // cell. On this DIFFUSE corpus with untrained seed reps the measured
    // agreement at the toy geometry is ~0.47 (the registered
    // ann_twolevel_assign audit reports it per cell); the floor here is
    // a smoke bound so a broken route (≈ random ≈ 1/16) can't pass, not
    // a quality claim
    val cs = cents(16)
    val flatDf = AnnQueries.assignNearest(emb, cs, out = "flat")
    val twoDf = AnnQueries.assignNearest(emb, cs, out = "two", routeAt = 1)
    val joined = flatDf.select(col("vec_id"), col("flat"))
      .join(twoDf.select(col("vec_id"), col("two")), "vec_id")
    val n = joined.count()
    val agree = joined.where(col("flat") === col("two")).count()
    assert(n > 0)
    assert(agree.toDouble / n >= 0.3, s"two-level agreement $agree/$n below floor")
  }

  test("forced route: probe navigation = best group rep, then nprobe best cells within it") {
    import spark.implicits._
    val k = 16
    val cs = cents(k)
    val perGroup = 4; val nGroups = 4; val nprobe = 2 // NProbeBuckets
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val expected = vecs.map { case (id, v) =>
      // best group by rep cosine, strict >, tie -> lower group (kernel rule)
      var bg = 0; var bgc = cos(v, cs(0))
      (1 until nGroups).foreach { g =>
        val c = cos(v, cs(g * perGroup)); if (c > bgc) { bgc = c; bg = g }
      }
      val lo = bg * perGroup
      val cells = (lo until math.min(lo + perGroup, k)).map(i => (i, cos(v, cs(i))))
      // nprobe best within the group, strict >, first index on ties
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      (0 until math.min(nprobe, cells.length)).foreach { _ =>
        val best = cells.filterNot(c => picked.contains(c._1))
          .reduceLeft((a, b) => if (b._2 > a._2) b else a)
        picked += best._1
      }
      id -> picked.toSeq
    }.toMap
    val got = emb.withColumn("top_c", AnnQueries.probeTopCForced(cs))
      .select(col("vec_id"), expr("transform(top_c, x -> x.idx)").as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got === expected && got.nonEmpty)
    // and below the route the default branch is the flat struct ranking
    // (the committed family form — consumers read x.idx)
    val flat = emb.withColumn("top_c",
        org.apache.spark.sql.functions.slice(reverse(array_sort(transform(
          VectorExpressions.centroidCosines(col("embedding"), cs),
          (c, i) => struct(c.as("cos"), (-i).as("nidx"), i.as("idx"))))), 1, nprobe))
      .select(col("vec_id"), expr("transform(top_c, x -> x.idx)").as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    val dflt = emb.withColumn("top_c", AnnQueries.probeTopCDefault(cs))
      .select(col("vec_id"), expr("transform(top_c, x -> x.idx)").as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(dflt === flat)
  }
}
