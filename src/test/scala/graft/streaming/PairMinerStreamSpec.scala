package graft.streaming

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark can build its encoder without an outer scope. */
case class MinerDoc(doc_id: Long, text: String)

/** The streaming contrastive pair miner pinned against the archive it
  * indexes: arriving copies of archived documents must mine their exact
  * archive twin as the positive; unseen documents mine nothing. */
class PairMinerStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Doc = MinerDoc
  private def Doc(id: Long, text: String): MinerDoc = MinerDoc(id, text)

  /** Archive index frames built from the sf0.001 corpus with the same
    * expressions the batch verify uses. */
  private lazy val index: (DataFrame, DataFrame, DataFrame, DataFrame, Long, Long) = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    graft.plans.VectorExpressions.register(spark)
    import graft.functions.TextFunctions.{words, shingles}
    val docs = Tables(TestSpark.Sf0001).documents.select("doc_id", "text")
    val sh = docs.withColumn("w", words(col("text")))
      .withColumn("s", shingles("w")).select("doc_id", "s")
    val sigs = graft.operators.DedupQueries.bandExplode(sh)
      .select("doc_id", "band_id", "band_hash").cache()
    val tf = sh.select(col("doc_id"), explode(col("s")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache()
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df")).cache()
    val nDocs = docs.count()
    val wt = tf.join(dfx, Seq("term"))
      .withColumn("wgt",
        expr(s"tf * ((100 * (2 * ${nDocs}L - 2 * df + 1)) div (2 * df + 1))"))
      .select("doc_id", "term", "wgt").cache()
    val n2 = wt.groupBy("doc_id")
      .agg(sum(expr("CAST(wgt AS DECIMAL(18,0)) * wgt")).as("n2")).cache()
    val maxDoc = docs.agg(max(col("doc_id"))).head.getLong(0)
    (sigs, wt, n2, dfx, nDocs, maxDoc)
  }

  private def mine(batch: DataFrame): DataFrame = {
    val (sigs, wt, n2, dfx, nDocs, maxDoc) = index
    DocStreams.minePairsBatch(batch, sigs, wt, n2, dfx, nDocs, maxDoc)
  }

  test("arriving archive copies mine their exact twin as the positive") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val archive = Tables(TestSpark.Sf0001).documents
      .select("doc_id", "text").orderBy("doc_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val textOf = Tables(TestSpark.Sf0001).documents
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val arriving = archive.map { case (id, text) => Doc(id + 100000L, text) }
    val out = mine(arriving.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))
    assert(out.nonEmpty)
    val byAnchor = out.groupBy(_._1)
    arriving.foreach { d =>
      val rows = byAnchor.getOrElse(d.doc_id, Array.empty)
      assert(rows.nonEmpty, s"copy of archived doc ${d.doc_id - 100000L} mined nothing")
      val (_, pos, cos, _, _) = rows.head
      // identical text ⇒ identical frozen-stat weight vector ⇒ cosine 1
      assert(cos == 1.0)
      assert(textOf(pos) == d.text, "positive must carry the same text as the arrival")
      rows.foreach { case (a, p, _, draw, neg) =>
        assert(draw >= 0 && draw < 2)
        assert(neg != a && neg != p && neg >= 0)
      }
    }
  }

  test("unseen documents mine nothing; foreachBatch plumbing lands the same rows") {
    val novel = Seq(
      Doc(900001L, "zq xv wj kp unique nonsense tokens never in any archive shingle"),
      Doc(900002L, "another entirely fabricated string of improbable uncorrelated words"))
    assert(mine(novel.toDF("doc_id", "text")).count() == 0)

    // stream the same arrivals through foreachBatch — identical rows land
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val archive = Tables(TestSpark.Sf0001).documents
      .select("doc_id", "text").orderBy("doc_id").limit(3)
      .collect().map(r => Doc(r.getLong(0) + 100000L, r.getString(1)))
    val direct = mine(archive.toSeq.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val landed = scala.collection.mutable.Set.empty[Seq[Any]]
    val mem = MemoryStream[Doc](spark)
    val q = mem.toDF().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        landed ++= mine(b).collect().map(_.toSeq)
        ()
      }
      .start()
    try { mem.addData(archive.toSeq); q.processAllAvailable() } finally q.stop()
    assert(landed.toSet == direct)
  }
}
