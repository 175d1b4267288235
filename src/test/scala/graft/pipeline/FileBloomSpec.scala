package graft.pipeline

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file Bloom manifest: zero false negatives, measured pruning on a
  * high-cardinality key where zone-map ranges prune nothing. */
class FileBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 8 files; keys striped so every file's [min, max] spans nearly the
    * whole domain — the regime where range pruning is useless. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bloom").toString
    spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") * 7L).as("payload"))
      .repartition(8, col("k"))
      .write.mode("overwrite").parquet(d)
    d
  }

  private lazy val nFiles: Long =
    spark.read.parquet(dir).select(input_file_name()).distinct().count()

  private lazy val bloom = FileBloom.build(spark.read.parquet(dir), "k").cache()

  test("zone-map ranges cannot prune this layout; bloom can") {
    val zm = ZoneMap.build(spark.read.parquet(dir), Seq("k"))
    val zmFiles = ZoneMap.candidateFiles(zm, "k", lit(1234L), lit(1234L))
    assert(zmFiles.size == nFiles, s"scattered keys should defeat range pruning, got ${zmFiles.size}/$nFiles")
    val bFiles = FileBloom.candidateFiles(bloom, "k", lit(1234L))
    assert(bFiles.size < nFiles, s"bloom should prune scattered keys, got ${bFiles.size}/$nFiles")
  }

  test("no false negatives: every present key's file survives; lookup rows match full scan") {
    val full = spark.read.parquet(dir)
    for (key <- Seq(0L, 7L, 1234L, 3999L)) {
      val got = FileBloom.prunedParquet(spark, dir, bloom, "k", lit(key))
        .select("payload").as[Long].collect().toSeq
      val want = full.where(col("k") === key).select("payload").as[Long].collect().toSeq
      assert(got == want && got.nonEmpty, s"key $key")
    }
  }

  test("absent keys usually read nothing (false positives bounded, never wrong results)") {
    val absent = (4001L to 4200L)
    val phantomFiles = absent.map(k => FileBloom.candidateFiles(bloom, "k", lit(k)).size)
    // ~500 distinct keys/file at m=4096, k=3 → fp well under 10% per file;
    // the assertion leaves slack (exactness is not the contract, the
    // no-false-negative test above is)
    assert(phantomFiles.sum.toDouble / (absent.size * nFiles) < 0.25,
      s"false-positive rate too high: ${phantomFiles.sum}/${absent.size * 8}")
    absent.take(20).foreach { k =>
      assert(FileBloom.prunedParquet(spark, dir, bloom, "k", lit(k)).count() == 0)
    }
  }

  test("manifest stays bounded: at most numBits cells per file") {
    val sizes = bloom.select(size(col("cells"))).as[Int].collect()
    assert(sizes.forall(s => s > 0 && s <= 4096))
  }
}
