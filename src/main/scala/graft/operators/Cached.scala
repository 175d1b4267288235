package graft.operators

import org.apache.spark.sql.Dataset

/** Registry for intermediates the operators persist (edge lists, session
  * frames, segmented vocabularies). The frames are consumed LAZILY by the
  * plans the query functions return, so the functions themselves cannot
  * unpersist — the cache would be dropped before the caller's action runs
  * and every downstream branch would re-derive the intermediate. Instead
  * each persist is registered here, and the consumer releases after its
  * action: `Verify` and `Bench` call [[releaseAll]] per query, and a
  * library/notebook user does the same (or `spark.catalog.clearCache()`)
  * once the returned frame has been acted on. Without a release, repeated
  * calls do NOT stack cache entries — Spark's CacheManager dedupes by
  * logical plan — but the last materialization of each intermediate stays
  * resident for the session's lifetime.
  */
object Cached {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register an operator-persisted intermediate for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = { tracked.add(ds); ds }

  /** Unpersist every tracked intermediate (non-blocking). Safe to call at
    * any time: a release before the consumer's action only costs a
    * recompute, never correctness. */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) { ds.unpersist(blocking = false); ds = tracked.poll() }
  }
}
