package graft.pipeline

import graft.TestSpark
import graft.operators.AnnQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §8h(ag) — the PQ code corpus is an ordinary maintained dataset: after
  * many incremental encode drops leave it in small files, the generic
  * compaction pass consolidates it, and ADC search served from the
  * compacted table is bit-identical. No special-casing anywhere — codes
  * flow through the same manifest/plan/compact machinery as any other
  * table, which is the point. */
class CodesCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compacted PQ code table serves identical ADC results from fewer files") {
    val base = java.nio.file.Files.createTempDirectory("graft-codescomp").toString
    val idx = s"$base/index"
    AnnQueries.persistPqCorpus(spark, TestSpark.Sf0001, idx)
    // simulate six incremental encode drops
    val codes = spark.read.parquet(s"$idx/codes")
    codes.repartition(6).write.mode("overwrite").parquet(s"$base/drops")
    // same manifest path as every other table: the zone-map build
    val manifest = ZoneMap.build(
      spark.read.parquet(s"$base/drops"), Seq("vec_id")).localCheckpoint()
    assert(manifest.count() >= 4, "expected several small files")
    val assignment = Compaction.plan(manifest, targetRows = codes.count() + 1)
    assert(assignment.nonEmpty && assignment.size == manifest.count())
    Compaction.compact(spark, assignment, s"$base/compacted",
      ps => spark.read.parquet(ps: _*))

    // rebuild an index dir backed by the compacted codes
    val idx2 = s"$base/index2"
    spark.read.parquet(s"$idx/codebook").write.parquet(s"$idx2/codebook")
    spark.read.parquet(s"$base/compacted").drop("compaction_group")
      .write.parquet(s"$idx2/codes")

    val served = AnnQueries.pqAdcTopKFrom(spark, TestSpark.Sf0001, idx2)
      .collect().map(_.toSeq).toSet
    val original = AnnQueries.pqAdcTopKFrom(spark, TestSpark.Sf0001, idx)
      .collect().map(_.toSeq).toSet
    assert(served.nonEmpty && served == original)
    // and it actually consolidated
    val outFiles = new java.io.File(s"$base/compacted").listFiles()
      .filter(f => f.isDirectory || f.getName.endsWith(".parquet"))
    assert(spark.read.parquet(s"$base/compacted").count() == codes.count())
  }
}
