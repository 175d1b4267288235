package graft.plans

import graft.TestSpark
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CosineSim matches the built-in zip_with/aggregate formulation") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)), // identical → 1.0
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),             // orthogonal → 0.0
      (3L, Array(1.0f, 2.0f, 3.0f), Array(-4.0f, 5.5f, 0.25f)),
    ).toDF("id", "a", "b")
    val builtin = expr(
      """aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, (s, v) -> s + v)
        | / (sqrt(aggregate(transform(a, x -> double(x) * double(x)), 0D, (s, v) -> s + v))
        |  * sqrt(aggregate(transform(b, x -> double(x) * double(x)), 0D, (s, v) -> s + v)))""".stripMargin)
    val rows = df.select(
        col("id"),
        VectorExpressions.cosine(col("a"), col("b")).as("native"),
        builtin.as("reference"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12, s"id=${r.getLong(0)}")
    }
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(1)) < 1e-12)
  }

  test("CosineSim: zero vector → 0.0, null input → null") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f))),
      (2L, None, Some(Array(1.0f, 1.0f))),
    ).toDF("id", "a", "b")
    val rows = df.select(VectorExpressions.cosine(col("a"), col("b"))).orderBy("id").collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("CosineSim survives both codegen and interpreted paths") {
    VectorExpressions.register(spark)
    val df = Seq((1L, Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("id", "a", "b")
    val expected = 4.0 / 5.0
    val viaCodegen = df.select(VectorExpressions.cosine(col("a"), col("b"))).head().getDouble(0)
    // interpreted path: filter forces eval in a non-codegen context too
    val viaEval = df.where(VectorExpressions.cosine(col("a"), col("b")) > 0.5).count()
    assert(math.abs(viaCodegen - expected) < 1e-12)
    assert(viaEval == 1L)
  }

  test("TopK.perKey matches window row_number ranking") {
    val n = 500
    val scored = (1 to n).map { i =>
      (i % 7L, (i * 37 % 100) / 100.0, i.toLong) // key, score, id
    }.toDF("probe_id", "cos", "vec_id").repartition(8)
    val got = TopK.perKey(scored, "probe_id", "cos", "vec_id", 5)
      .orderBy("probe_id", "rank")
      .select("probe_id", "rank", "vec_id", "cos").collect().toSeq
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    val want = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
      .orderBy("probe_id", "rank")
      .select("probe_id", "rank", "vec_id", "cos").collect().toSeq
    assert(got == want)
  }

  test("ByteSliceSum matches a driver byte fold, clamps ranges, survives both paths") {
    VectorExpressions.register(spark)
    val payloads = (1L to 30L).map { i =>
      (i, Array.tabulate(((i * 17) % 50).toInt + 1)(j => ((i * 31 + j * 7) % 256).toByte))
    }
    val df = payloads.toDF("id", "p")
    // full range, interior quarter, and an overshooting slice per row
    val rows = df.select(col("id"),
        VectorExpressions.byteSliceSum(col("p"), lit(0L), lit(1000L)).as("full"),
        VectorExpressions.byteSliceSum(col("p"), expr("CAST(length(p) div 4 AS LONG)"),
          expr("CAST(length(p) div 4 AS LONG)")).as("q2"),
        VectorExpressions.byteSliceSum(col("p"), expr("CAST(length(p) AS LONG) - 2L"),
          lit(99L)).as("tail"))
      .collect()
    rows.foreach { r =>
      val bytes = payloads(r.getLong(0).toInt - 1)._2
      val nb4 = bytes.length / 4
      assert(r.getLong(1) == bytes.map(b => (b & 0xff).toLong).sum)
      assert(r.getLong(2) == bytes.slice(nb4, 2 * nb4).map(b => (b & 0xff).toLong).sum)
      assert(r.getLong(3) == bytes.drop(math.max(bytes.length - 2, 0)).map(b => (b & 0xff).toLong).sum)
    }
    // interpreted path (eval) agrees: use it in a filter that defeats codegen staging
    val viaEval = df.where(
      VectorExpressions.byteSliceSum(col("p"), lit(0L), lit(1000L)) >= 0L).count()
    assert(viaEval == 30L)
  }

  test("ByteSliceMax matches a driver byte max, clamps ranges, empty slice is 0") {
    VectorExpressions.register(spark)
    val payloads = (1L to 30L).map { i =>
      (i, Array.tabulate(((i * 17) % 50).toInt + 1)(j => ((i * 31 + j * 7) % 256).toByte))
    }
    val df = payloads.toDF("id", "p")
    val rows = df.select(col("id"),
        VectorExpressions.byteSliceMax(col("p"), lit(0L), lit(1000L)).as("full"),
        VectorExpressions.byteSliceMax(col("p"), expr("CAST(length(p) div 4 AS LONG)"),
          expr("CAST(length(p) div 4 AS LONG)")).as("q2"),
        VectorExpressions.byteSliceMax(col("p"), lit(5000L), lit(10L)).as("beyond"))
      .collect()
    rows.foreach { r =>
      val bytes = payloads(r.getLong(0).toInt - 1)._2
      val nb4 = bytes.length / 4
      def mx(s: Seq[Byte]) = if (s.isEmpty) 0L else s.map(b => (b & 0xff).toLong).max
      assert(r.getLong(1) == mx(bytes.toSeq))
      assert(r.getLong(2) == mx(bytes.slice(nb4, 2 * nb4).toSeq))
      assert(r.getLong(3) == 0L, "out-of-range slice must read 0")
    }
    val viaEval = df.where(
      VectorExpressions.byteSliceMax(col("p"), lit(0L), lit(1000L)) >= 0L).count()
    assert(viaEval == 30L)
  }

  test("SortedIntersectCount matches array_intersect size on sorted distinct sets") {
    VectorExpressions.register(spark)
    // deterministic set soup: overlapping ranges, strided gaps, empties
    val sets = (1L to 40L).map { i =>
      val a = (0L until 60L).filter(k => (k * i) % 7 != 1).map(k => k * i % 301)
      val b = (0L until 60L).filter(k => (k * (i + 3)) % 5 != 2).map(k => k * (i + 3) % 301)
      (i,
        a.distinct.sorted.toArray,
        if (i % 13 == 0) Array.empty[Long] else b.distinct.sorted.toArray)
    }
    val df = sets.toDF("id", "a", "b")
    val rows = df.select(col("id"),
        VectorExpressions.sortedIntersect(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("reference"))
      .collect()
    assert(rows.length == 40)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }
}
