package graft.pipeline

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measured execution ledger: input bytes, shuffle read/write, spill, and
  * task counts per tagged query run, captured from the scheduler's own
  * stage accounting (a `SparkListener` — the same source the Spark UI
  * reads) rather than asserted in prose. PLANS.md documents what a plan
  * SHOULD shuffle; this measures what a run DID shuffle, and the spec
  * suite pins the two together (the zero-shuffle chunker writes zero
  * shuffle bytes, the hash aggregate doesn't).
  *
  * Scoping rides job groups: [[measure]] tags every job the body
  * launches via `setJobGroup`, the listener maps job → stages → group,
  * and stage metrics fold into the tag's ledger. Driver-side state is a
  * handful of counters per tag — nothing row-scale. */
object Metrics {

  final case class Ledger(inputBytes: Long, shuffleReadBytes: Long,
                          shuffleWriteBytes: Long, spillBytes: Long,
                          tasks: Long) {
    def +(o: Ledger): Ledger = Ledger(
      inputBytes + o.inputBytes, shuffleReadBytes + o.shuffleReadBytes,
      shuffleWriteBytes + o.shuffleWriteBytes, spillBytes + o.spillBytes,
      tasks + o.tasks)
  }
  private val Zero = Ledger(0, 0, 0, 0, 0)

  private final class Collector extends SparkListener {
    val stageTag = new TrieMap[Int, String]
    val jobStages = new TrieMap[Int, Seq[Int]]
    val ledgers = new TrieMap[String, Ledger]
    override def onJobStart(job: SparkListenerJobStart): Unit = {
      val tag = Option(job.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).orNull
      if (tag != null && tag.startsWith(Prefix)) {
        job.stageIds.foreach(sid => stageTag.put(sid, tag))
        jobStages.put(job.jobId, job.stageIds)
      }
    }
    // get, not remove: a fetch-failure resubmit completes the same stage
    // id again and the retry's (successful) metrics must still resolve
    // their tag. Eviction happens at job end — which also reclaims
    // entries for stages the scheduler skipped (they never complete).
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      stageTag.get(ev.stageInfo.stageId).foreach { tag =>
        val m = ev.stageInfo.taskMetrics
        val add = Ledger(
          m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled,
          ev.stageInfo.numTasks.toLong)
        ledgers.updateWith(tag) { cur => Some(cur.getOrElse(Zero) + add) }
      }
    override def onJobEnd(ev: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobStages.remove(ev.jobId).foreach(_.foreach(stageTag.remove))
  }

  private val Prefix = "graft-metrics:"
  private val collectors = new TrieMap[SparkSession, Collector]

  private def collector(spark: SparkSession): Collector =
    collectors.getOrElseUpdate(spark, {
      val c = new Collector
      spark.sparkContext.addSparkListener(c)
      c
    })

  /** Run `body` under a tagged job group and return its result together
    * with the measured ledger. Listener delivery is asynchronous, so the
    * ledger is read after the scheduler's event queue drains. */
  def measure[T](spark: SparkSession, tag: String)(body: => T): (T, Ledger) = {
    val c = collector(spark)
    val group = Prefix + tag
    c.ledgers.remove(group)
    spark.sparkContext.setJobGroup(group, tag, interruptOnCancel = false)
    val out =
      try body
      finally spark.sparkContext.clearJobGroup()
    // flush pending listener events so the ledger is complete, then evict
    // the tag — ledgers must not accumulate across a long-lived session
    org.apache.spark.graftbridge.ListenerBridge.flush(spark.sparkContext)
    (out, c.ledgers.remove(group).getOrElse(Zero))
  }
}
