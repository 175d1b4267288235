package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Arrival-order independence of the interval-set stateful sessionizer:
  * for events spanning less than the watermark horizon, EVERY arrival
  * order is admissible (nothing is ever older than the watermark), so the
  * emitted sessions must equal the batch gap-merge regardless of how the
  * stream is shuffled and chunked. This is the property the interval-set
  * state exists for — a lone-open-session fold passes ordered arrival but
  * fails shuffled arrival (glue/bridge/separate cases). Deterministic
  * seeded trials (scalacheck-style, hand-rolled: the scalatest-scalacheck
  * bridge is not on the offline classpath). */
class SessionizeProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val GapMin = 30L
  private val Base = Timestamp.valueOf("2026-03-01 08:00:00").getTime

  /** Reference: sort, split on gap > 30min, fold sessions. */
  private def batchSessions(minutes: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = minutes.sorted
    sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) { case (acc, m) =>
      val (s, last, n) = acc.head
      if (m - last <= GapMin) (s, m, n + 1) :: acc.tail
      else (m, m, 1L) :: acc
    }.reverse
  }

  test("stateful sessionize equals the batch gap-merge for any arrival order") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919L)
      // distinct minutes inside a 100-minute window (< the 2h watermark
      // horizon, so any arrival order is admissible)
      val minutes = rnd.shuffle((0L to 100L).toVector).take(1 + rnd.nextInt(14)).toSeq
      val nChunks = 1 + rnd.nextInt(4)
      val events = minutes.zipWithIndex.map { case (m, i) =>
        Event(i.toLong, new Timestamp(Base + m * 60000L), 1L, "e", 0.0)
      }
      val mem = MemoryStream[Event](spark)
      val name = s"s_prop_$seed"
      val q = EventStreams.sessionizeStateful(mem.toDS())
        .toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        events.grouped(math.max(1, events.size / nChunks)).foreach { chunk =>
          mem.addData(chunk); q.processAllAvailable()
        }
        // sentinel far past the horizon closes everything
        mem.addData(Event(-1L, new Timestamp(Base + 12L * 3600 * 1000), -1L, "x", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name)
        .where($"user_id" === 1L).orderBy("session_start")
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().toSeq
        .map { case (a, b, n) => ((a.getTime - Base) / 60000L, (b.getTime - Base) / 60000L, n) }
      assert(got == batchSessions(minutes), s"seed=$seed minutes=${minutes.sorted}")
    }
  }
}
