package graft.plans

import graft.TestSpark
import graft.operators.Banded
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BandedPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (band_id, band_hash, id) rows: bucket (0,"x") = {1,2,3}, (0,"y") =
    * {4}, (1,"x") = {1,2} (cross-band duplicate pair), plus a null id and
    * a duplicate membership row. */
  private def bands = Seq(
    (0, Some("x"), Some(1L)), (0, Some("x"), Some(2L)), (0, Some("x"), Some(3L)), (0, Some("x"), Some(2L)),
    (0, Some("y"), Some(4L)),
    (1, Some("x"), Some(1L)), (1, Some("x"), Some(2L)),
    (1, Some("y"), None),
    // NULL bucket keys never pair (join equality) — two of them must NOT bucket together
    (1, None, Some(8L)), (1, None, Some(9L))
  ).toDF("band_id", "band_hash", "id")

  test("emits each bucket's ordered pairs; null ids and dup memberships collapse") {
    val got = Banded.pairsExec(bands, Seq("band_id", "band_hash"), "id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))) // (1,2) once per band
    val distinct = Banded.pairsExec(bands, Seq("band_id", "band_hash"), "id")
      .distinct().as[(Long, Long)].collect().sorted.toSeq
    assert(distinct == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("maxBucket drops whale buckets, keeps the rest") {
    val got = Banded.pairsExec(bands, Seq("band_id", "band_hash"), "id", maxBucket = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L))) // bucket (0,x) of size 3 dropped; (1,x) kept
  }

  test("parity with the declarative self-join on real LSH bands") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 4-bit sign bands — enough collisions to be a real test
    def bandHash(b: Int) = (0 until 4).map { r =>
      val p = b * 4 + r
      when(col("embedding")((3 * p + 1) % 64) > col("embedding")((5 * p + 2) % 64), lit(1 << r))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val bandRows = emb.select(col("vec_id"),
        explode(array((0 until 6).map(b => struct(lit(b).as("band_id"), bandHash(b).as("band_hash"))): _*)).as("b"))
      .select(col("vec_id"), col("b.band_id").as("band_id"), col("b.band_hash").as("band_hash"))
    val viaExec = Banded.pairsExec(bandRows, Seq("band_id", "band_hash"), "vec_id")
      .distinct().as[(Long, Long)].collect().toSet
    val a = bandRows.select(col("band_id"), col("band_hash"), col("vec_id").as("id_a"))
    val c = bandRows.select(col("band_id"), col("band_hash"), col("vec_id").as("id_b"))
    val viaJoin = a.join(c, Seq("band_id", "band_hash"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b")
      .distinct().as[(Long, Long)].collect().toSet
    assert(viaExec.nonEmpty && viaExec == viaJoin)
  }

  test("plans as exec + single exchange, no join operator") {
    val plan = Banded.pairsExec(bands, Seq("band_id", "band_hash"), "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BandedPairs"), plan) // exec node prints without the Exec suffix
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
