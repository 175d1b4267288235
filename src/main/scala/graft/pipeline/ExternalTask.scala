package graft.pipeline

import scala.collection.concurrent.TrieMap

/** Retry/poll wrapper for DAG tasks whose completion depends on an
  * EXTERNAL service — the post-load API pattern of the reference
  * (scripts/transmart_api_calls.py:56-201: trigger the after-load update,
  * then `check_status` polls every `sleep` seconds up to `n` times until
  * the service reports COMPLETED, raising on FAILED or timeout; the
  * trigger call itself is retried on transient transport errors).
  *
  * The wrapper keeps the Dag's done-signal discipline intact: a completed
  * external job yields an output SIGNAL (the service's content signature
  * for what it built), so downstream tasks invalidate on external-output
  * change exactly as they do for in-DAG outputs. Sleeping is injected —
  * specs run with a virtual clock, production passes `Thread.sleep`.
  * Driver-side state is one counter pair per task. */
object ExternalTask {

  /** One poll's answer from the external service. */
  sealed trait PollStatus
  object PollStatus {
    /** Still running — poll again after the delay. */
    case object Pending extends PollStatus
    /** Done; `signal` is the external output's content signature. */
    final case class Completed(signal: String) extends PollStatus
    /** The external job itself failed — never retried (matches the
      * reference: a FAILED update_status raises immediately). */
    final case class Failed(message: String) extends PollStatus
  }

  /** Bounds and pacing. `submitAttempts` retries the TRIGGER call on
    * exception (transient transport errors); `maxPolls` × `delayMs` is
    * the completion budget (the reference's `sleep*n` timeout);
    * `backoff` multiplies the delay each poll (1.0 = the reference's
    * fixed cadence). */
  final case class RetryPolicy(submitAttempts: Int = 3,
                               maxPolls: Int = 10,
                               delayMs: Long = 30000L,
                               backoff: Double = 1.0,
                               sleep: Long => Unit = Thread.sleep) {
    require(submitAttempts >= 1 && maxPolls >= 1 && delayMs >= 0 && backoff >= 1.0,
      "RetryPolicy bounds must be positive")
  }

  /** What one execution cost: trigger attempts and polls consumed —
    * landed with the run history so "how flaky is the external service"
    * is an ordinary query. */
  final case class Attempts(submits: Int, polls: Int)

  final class ExternalTaskException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** Build a [[Task]] that triggers external work and polls it to
    * completion under `policy`, recording consumed attempts into
    * `attemptLog` (keyed by task id; the entry is written on success AND
    * on failure, so the report shows what a dead task cost). `submit`
    * fires the external job; `poll` asks its status. */
  def task(id: String, deps: Seq[String],
           submit: () => Unit, poll: () => PollStatus,
           policy: RetryPolicy = RetryPolicy(),
           attemptLog: TrieMap[String, Attempts] = new TrieMap,
           externalInput: () => String = () => ""): Task =
    Task(id, deps, () => run(id, submit, poll, policy, attemptLog), externalInput)

  private def run(id: String, submit: () => Unit, poll: () => ExternalTask.PollStatus,
                  policy: RetryPolicy, attemptLog: TrieMap[String, Attempts]): String = {
    var submits = 0
    var polls = 0
    def record(): Unit = attemptLog.put(id, Attempts(submits, polls))
    // trigger with bounded retry: transient transport failures re-submit
    // (the reference re-raises wrapped; operationally the whole luigi task
    // re-runs — here the retry is owned by the wrapper, bounded, and
    // visible in the attempt log)
    var submitted = false
    var lastErr: Throwable = null
    while (!submitted && submits < policy.submitAttempts) {
      submits += 1
      try { submit(); submitted = true }
      catch { case e: Throwable => lastErr = e }
    }
    if (!submitted) {
      record()
      throw new ExternalTaskException(
        s"external task $id: trigger failed after ${policy.submitAttempts} attempts", lastErr)
    }
    // poll to completion: Pending → sleep and retry within budget;
    // Failed → raise immediately; budget exhausted → timeout
    var delay = policy.delayMs
    while (polls < policy.maxPolls) {
      polls += 1
      poll() match {
        case PollStatus.Completed(signal) =>
          record()
          return signal
        case PollStatus.Failed(msg) =>
          record()
          throw new ExternalTaskException(s"external task $id failed: $msg")
        case PollStatus.Pending =>
          if (polls < policy.maxPolls) {
            policy.sleep(delay)
            delay = (delay * policy.backoff).toLong
          }
      }
    }
    record()
    throw new ExternalTaskException(
      s"external task $id: not complete after ${policy.maxPolls} polls " +
        s"(budget ${policy.maxPolls * policy.delayMs} ms)")
  }
}
