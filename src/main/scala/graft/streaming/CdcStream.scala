package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One changelog record, as the batch `etl_cdc_apply` reads the orders
  * table: (key, seq = (date, orderkey), op source = status, payload). */
final case class OrderChange(o_custkey: Long, o_orderdate: Timestamp, o_orderkey: Long,
                             o_orderstatus: String, o_totalprice: Double)

/** The compacted upsert record for one key: latest change wins. */
final case class LatestChange(c_custkey: Long, o_orderdate: Timestamp, o_orderkey: Long,
                              op: String, new_bal: Double)

/** Streaming twin of the CDC/MERGE apply: a latest-wins changelog
  * compaction that maintains, per key, the maximal-(seq) change seen so
  * far and RE-EMITS the key's upsert record whenever a newer change
  * supersedes it (update semantics — the emitted stream is exactly the
  * changelog a downstream MERGE consumes).
  *
  * State is one small record per key — the upsert view IS the state — so
  * a 100 TB deployment shards it across executors by key hash in the
  * state store (RocksDB-backed, incrementally checkpointed) like the
  * sessionizer's. No watermark/timeout: dimension keys never expire by
  * design; bounding memory is the key cardinality, not time. Late or
  * replayed changes are handled by the seq compare — an older change
  * arriving after a newer one is swallowed silently (idempotent replay),
  * the property that makes the compaction safe under at-least-once
  * delivery.
  *
  * Runs unchanged in BATCH (each group folds once, emitting exactly the
  * per-key latest) — the spec pins that to the batch window's rn=1. */
object CdcStream {

  /** (date, orderkey) lexicographic — the same latest-wins order the
    * batch twin's window uses. */
  private def newer(a: (Timestamp, Long), b: (Timestamp, Long)): Boolean =
    a._1.after(b._1) || (a._1.equals(b._1) && a._2 > b._2)

  def latestWins(changes: Dataset[OrderChange]): Dataset[LatestChange] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.o_custkey)
      .flatMapGroupsWithState[LatestChange, LatestChange](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[OrderChange], state: GroupState[LatestChange]) =>
          var cur = state.getOption.orNull
          batch.foreach { c =>
            if (cur == null || newer((c.o_orderdate, c.o_orderkey), (cur.o_orderdate, cur.o_orderkey))) {
              cur = LatestChange(key, c.o_orderdate, c.o_orderkey,
                if (c.o_orderstatus == "F") "D" else "U", c.o_totalprice)
            }
          }
          val prev = state.getOption
          if (cur != null && !prev.contains(cur)) {
            state.update(cur)
            Iterator.single(cur)
          } else Iterator.empty
      }
  }
}
