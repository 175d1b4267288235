package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Pipeline status notification — the engine-side mirror of the
  * reference's e-mail reporting (`scripts/email_client.py`: parse the run
  * log into summary + errors, compose a subject-prefixed body, send).
  * Transport is out of scope here (no SMTP in a library); what the engine
  * owns is producing the SAME content deterministically: per-task
  * outcomes with durations, the skip/ran split from the Dag's
  * content-signature semantics, and a failure section naming the task
  * that died and everything it blocked. */
object RunReport {

  final case class Outcome(id: String, status: String, durationMs: Long)

  /** Wrap a task list so each `run` records its wall-clock duration and
    * any failure (rethrown after recording — the Dag's abort semantics
    * stay untouched). */
  def instrument(tasks: Seq[Task])
      : (Seq[Task], mutable.LinkedHashMap[String, Outcome]) = {
    val log = mutable.LinkedHashMap.empty[String, Outcome]
    val wrapped = tasks.map { t =>
      t.copy(run = () => {
        val t0 = System.nanoTime()
        try {
          val out = t.run()
          log(t.id) = Outcome(t.id, "ok", (System.nanoTime() - t0) / 1000000L)
          out
        } catch {
          case e: Throwable =>
            log(t.id) = Outcome(t.id, s"FAILED: ${e.getMessage}", (System.nanoTime() - t0) / 1000000L)
            throw e
        }
      })
    }
    (wrapped, log)
  }

  /** §8h(al) — land one run's outcomes as a queryable history row set
    * (run_id, task, status, duration_ms, skipped): the notification is
    * ephemeral, the history is a dataset — trend queries ("which task is
    * slowing down", "how often does load fail") are then ordinary graft
    * queries over `history()`. Append-only parquet, one directory per
    * run id, so landing is idempotent per run. */
  def land(spark: SparkSession, dir: String, runId: Long,
           report: Option[DagReport], outcomes: Seq[Outcome],
           attempts: Map[String, ExternalTask.Attempts] = Map.empty): Unit = {
    import spark.implicits._
    // external-task retry accounting rides along (0/0 for in-DAG tasks):
    // "how flaky is the external service" becomes a history query
    def att(id: String) = attempts.get(id)
    val rows =
      outcomes.map(o => (o.id, o.status, o.durationMs, false,
        att(o.id).map(_.submits).getOrElse(0), att(o.id).map(_.polls).getOrElse(0))) ++
        report.toSeq.flatMap(_.skipped.map(id => (id, "ok", 0L, true, 0, 0)))
    // run_id lives in the partition directory, not the file columns —
    // the partitioned read infers it back
    rows.toDF("task", "status", "duration_ms", "skipped", "n_submits", "n_polls")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/run_id=$runId")
  }

  def history(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/run_id=*")

  /** Compose the notification body (the reference's build_message_body
    * shape: subject prefix, summary section, error section). `report` is
    * None when the run aborted before completing. */
  def body(prefix: String, report: Option[DagReport],
           outcomes: Seq[Outcome], allTasks: Seq[String]): String = {
    val failed = outcomes.filter(_.status.startsWith("FAILED"))
    val attempted = outcomes.map(_.id).toSet
    val notReached = allTasks.filterNot(attempted.contains)
      .filterNot(id => report.exists(r => r.skipped.contains(id)))
    val status = if (failed.nonEmpty) "FAILED" else "SUCCESS"
    val b = new StringBuilder
    b ++= s"$prefix pipeline run: $status\n\n== summary ==\n"
    outcomes.foreach(o => b ++= f"${o.id}%-24s ${o.status}%-12s ${o.durationMs} ms\n")
    report.foreach { r =>
      r.skipped.foreach(id => b ++= f"$id%-24s up-to-date (signal match)\n")
    }
    if (failed.nonEmpty) {
      b ++= "\n== errors ==\n"
      failed.foreach(o => b ++= s"${o.id}: ${o.status.stripPrefix("FAILED: ")}\n")
      if (notReached.nonEmpty)
        b ++= s"blocked downstream: ${notReached.mkString(", ")}\n"
    }
    b.result()
  }

  /** A rendered notification: subject + body, ready for any transport. */
  final case class Notification(subject: String, body: String)

  /** Transport plug — the reference renders a template and SMTP-sends it
    * (scripts/email_client.py: Config → build_message_body → send); the
    * engine owns rendering only, transport stays injected. Deployments
    * bind SMTP/webhook/pager here; specs and the default harness bind
    * [[RecordingNotifier]]. */
  trait Notifier { def send(n: Notification): Unit }

  /** Capture-only transport: what the pipeline WOULD have sent, as data. */
  final class RecordingNotifier extends Notifier {
    val sent = mutable.ArrayBuffer.empty[Notification]
    def send(n: Notification): Unit = sent += n
  }

  /** Render the full notification in the reference template's shape
    * (templates/template_email.txt: status headline, execution-summary
    * section, error-message section, logfile pointer) over the engine's
    * own outcome data, then hand it to `notifier`. Subject carries the
    * configured prefix plus the run status, like `Config.set_subject`. */
  def notify(notifier: Notifier, prefix: String, report: Option[DagReport],
             outcomes: Seq[Outcome], allTasks: Seq[String],
             logFile: Option[String] = None): Notification = {
    val failed = outcomes.filter(_.status.startsWith("FAILED"))
    val status =
      if (failed.nonEmpty) "Errors found!" else "Completed successfully"
    val b = new StringBuilder
    b ++= s"Pipeline status: $status\n\n"
    b ++= "Execution Summary\n"
    b ++= "-" * 69 + "\n"
    b ++= body(prefix, report, outcomes, allTasks)
    logFile.foreach(f =>
      b ++= s"\nAdditional information can be retrieved from the logfile: $f\n")
    val n = Notification(s"$prefix ${if (failed.nonEmpty) "FAILED" else "SUCCESS"}", b.result())
    notifier.send(n)
    n
  }
}
