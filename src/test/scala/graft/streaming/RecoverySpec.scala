package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash/restart semantics: a checkpointed streaming query must resume
  * from its offsets with its AGGREGATION STATE intact — hours that were
  * half-counted before the stop must finish with the right totals, files
  * already ingested must not re-emit, and the file sink must hold each
  * sealed window exactly once. This is the property that makes the
  * streaming twins deployable: kill -9 at any trigger boundary loses
  * nothing and duplicates nothing. */
class RecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hourly agg resumes from checkpoint: state intact, exactly-once sink") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft-recover").toString
    val (srcDir, ckpt, sink) = (s"$base/src", s"$base/ckpt", s"$base/sink")

    val events = graft.sources.Tables(TestSpark.Sf0001).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .localCheckpoint()
    // phase 1: everything before a MID-HOUR cutoff (so the 12:00-13:00
    // window receives events in both phases — its half-counted state must
    // survive the restart; an id-parity split would instead make phase-2
    // events watermark-late, which is drop-correct but tests nothing)
    val cutoff = java.sql.Timestamp.valueOf("2024-01-15 12:30:00")
    events.where(col("ts") < lit(cutoff)).write.mode("overwrite").parquet(srcDir)

    def run(): Unit = {
      val q = EventStreams.hourlyAgg(
          spark.readStream.schema(events.schema).parquet(srcDir))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // phase 1 ingests, seals early windows, parks mid-hour state

    // phase 2: rest of the log + a far-future sentinel to seal everything
    events.where(col("ts") >= lit(cutoff)).write.mode("append").parquet(srcDir)
    val maxTs = events.agg(max("ts")).collect()(0).getTimestamp(0)
    Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 12L * 3600 * 1000), -1L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)
    run() // restart: same checkpoint, resumes offsets + state

    val got = spark.read.parquet(sink).where(col("event_type") =!= "sentinel")
    // exactly-once: no (bucket, type) appears twice across the two runs
    val dups = got.groupBy("bucket", "event_type").count().where(col("count") > 1).count()
    assert(dups == 0, s"$dups duplicated windows after restart")
    // state recovery: totals equal the batch twin's over the full log
    val gotRows = got
      .select(col("bucket"), col("event_type"), col("n_events"),
        round(col("total_value").cast("decimal(28,6)"), 2).cast("double").as("tv"))
      .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val want = graft.operators.CsrQueries.eventsHourlyAgg(spark, TestSpark.Sf0001)
      .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(gotRows.keySet == want.keySet && gotRows.nonEmpty)
    gotRows.foreach { case (k, (n, tv)) =>
      assert(n == want(k)._1, s"window $k count $n != ${want(k)._1}")
      assert(math.abs(tv - want(k)._2) < 1e-6, s"window $k total drifted")
    }
  }
}
