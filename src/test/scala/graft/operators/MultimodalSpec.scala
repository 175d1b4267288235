package graft.operators

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed decode plumbing: batch iterator over MediaRecord → features") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Tables(TestSpark.Sf0001).documents.limit(50)
    val media = Multimodal.fromDocuments(spark, docs)
    val feats = Multimodal.decode(media).collect()
    assert(feats.length == 50)
    val byId = feats.map(f => f.doc_id -> f).toMap
    // cross-check one record against driver-side truth
    val row = docs.select("doc_id", "text").as[(Long, String)].head()
    val bytes = row._2.getBytes("UTF-8")
    val f = byId(row._1)
    assert(f.n_bytes == bytes.length)
    assert(math.abs(f.byte_mean - bytes.map(b => (b & 0xff).toDouble).sum / bytes.length) < 1e-9)
    assert(f.head_hex == bytes.take(8).map("%02X".format(_)).mkString)
    assert(Set("png", "jpeg", "webp").contains(f.fmt))
  }

  test("decodeStub is deterministic and total on empty payloads") {
    val empty = Multimodal.decodeStub(MediaRecord(1L, Array.emptyByteArray, "png", 1, 1))
    assert(empty.n_bytes == 0 && empty.byte_mean == 0.0 && empty.head_hex == "")
    val a = Multimodal.decodeStub(MediaRecord(2L, Array[Byte](1, 2, 3), "jpeg", 1, 1))
    val b = Multimodal.decodeStub(MediaRecord(2L, Array[Byte](1, 2, 3), "jpeg", 1, 1))
    assert(a == b)
  }

  test("metadata struct prunes without touching payload bytes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val q = MultimodalQueries.binaryMeta(spark, TestSpark.Sf0001)
      .select("doc_id", "width", "height")
    // metadata-only projection must not carry the binary column
    assert(!q.schema.fieldNames.contains("payload"))
    assert(q.count() == 500)
  }
}
