package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.MessageDigest
import scala.collection.mutable

/** One pipeline task: runs, and yields a content signature of its output.
  * The signature — not a timestamp — is what downstream tasks key on,
  * exactly like the reference's done-signal content
  * (luigi-pipeline/main.py:66 `calc_done_signal_content`: the sorted
  * `file checksum` list of the output dir).
  *
  * `externalInput` is the task's out-of-DAG input signature — for a root
  * sync task, the current drop-zone checksum list. It is probed on every
  * execution (cheap metadata scan), so an externally-changed input
  * invalidates the task even though no upstream task changed. */
final case class Task(id: String, deps: Seq[String], run: () => String,
                      externalInput: () => String = () => "")

/** Where done-signals persist between runs (the reference writes
  * `.done-<task_id>` marker files — luigi_commons.py BaseTask). */
trait SignalStore {
  def get(taskId: String): Option[String]
  def put(taskId: String, signal: String): Unit
}

final class InMemorySignalStore extends SignalStore {
  private val m = mutable.Map.empty[String, String]
  def get(taskId: String): Option[String] = m.get(taskId)
  def put(taskId: String, signal: String): Unit = m(taskId) = signal
}

/** `.done-<task_id>` files under a directory, like the reference. */
final class FileSignalStore(dir: Path) extends SignalStore {
  Files.createDirectories(dir)
  private def p(id: String) = dir.resolve(s".done-$id")
  def get(taskId: String): Option[String] =
    if (Files.exists(p(taskId)))
      Some(new String(Files.readAllBytes(p(taskId)), StandardCharsets.UTF_8))
    else None
  def put(taskId: String, signal: String): Unit =
    Files.write(p(taskId), signal.getBytes(StandardCharsets.UTF_8))
}

/** Result of one DAG execution. */
final case class DagReport(ran: Seq[String], skipped: Seq[String])

/** Dependency-DAG scheduler with content-signature skip semantics
  * (SURVEY §2.2 row 23).
  *
  * Mirrors the reference's Luigi orchestration (luigi_commons.py:38-78
  * `BaseTask.complete`): a task is complete iff its stored done-signal
  * matches the signal computed from its *current* inputs — so any change in
  * an upstream output invalidates the whole downstream cone, and an
  * unchanged pipeline is a no-op. Scheduling is driver-side (the DAG is
  * bounded config, like the reference's task graph); the heavy lifting
  * happens inside each task's `run`, which is typically a Spark job.
  */
final class Dag(tasks: Seq[Task]) {
  private val byId: Map[String, Task] = tasks.map(t => t.id -> t).toMap
  require(byId.size == tasks.size, "duplicate task ids")
  tasks.foreach(t => t.deps.foreach(d =>
    require(byId.contains(d), s"task ${t.id}: unknown dependency $d")))

  /** Deterministic topological order (stable: ready tasks run in input
    * order); cycles are detected up front. */
  val order: Seq[String] = {
    val indeg = mutable.Map(tasks.map(t => t.id -> t.deps.size): _*)
    val out = mutable.ArrayBuffer.empty[String]
    val remaining = mutable.ArrayBuffer(tasks.map(_.id): _*)
    while (remaining.nonEmpty) {
      val ready = remaining.filter(id => indeg(id) == 0)
      require(ready.nonEmpty, s"dependency cycle among: ${remaining.mkString(", ")}")
      ready.foreach { id =>
        out += id
        remaining -= id
        tasks.foreach(t => if (t.deps.contains(id)) indeg(t.id) -= 1)
      }
    }
    out.toSeq
  }

  private def sha1(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Input signal of a task = hash over its id + its external input
    * signature + each dep's output signal (sorted by dep id). */
  private def inputSignal(t: Task, outSignals: Map[String, String]): String =
    sha1((t.id +: t.externalInput() +: t.deps.sorted.map(d => s"$d=${outSignals(d)}")).mkString("\n"))

  /** Run the DAG: a task whose stored signal matches its current input
    * signal is skipped — but its output signature must still flow to
    * downstream input signals, so skipped tasks contribute their stored
    * output signal. Store layout per task: "inputSig\noutputSig". */
  def execute(store: SignalStore): DagReport = {
    val ran = mutable.ArrayBuffer.empty[String]
    val skipped = mutable.ArrayBuffer.empty[String]
    val outSignals = mutable.Map.empty[String, String]
    order.foreach { id =>
      val t = byId(id)
      val inSig = inputSignal(t, outSignals.toMap)
      store.get(id) match {
        case Some(stored) if stored.takeWhile(_ != '\n') == inSig =>
          skipped += id
          outSignals(id) = stored.dropWhile(_ != '\n').drop(1)
        case _ =>
          val outSig = t.run()
          store.put(id, s"$inSig\n$outSig")
          ran += id
          outSignals(id) = outSig
      }
    }
    DagReport(ran.toSeq, skipped.toSeq)
  }
}
