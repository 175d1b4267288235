package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Per-key top-k as a first-class operator (SURVEY §8 candidate (a),
  * brief preference order (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Spark ships a *global* top-k physical operator (TakeOrderedAndProject)
  * but nothing per-key — the declarative routes are a window (full
  * shuffle + per-key sort) or [[graft.operators.TopK.perKey]]'s two-phase
  * aggregate (collect_list + array_sort per group). This operator keeps a
  * bounded heap instead: the partial exec filters each input partition to
  * ≤k rows per key map-side (so, like the agg, the exchange carries at
  * most k·partitions rows per key), and the final exec merges heaps and
  * emits ranked rows. No sort of anything larger than k ever happens.
  *
  * Ranking is (score DESC, id ASC) with rank 1..k — semantics identical
  * to TopK.perKey, which the parity spec pins.
  *
  * NULL semantics: rows whose score or id is NULL are skipped (they can
  * never rank — reading a NULL slot as a primitive would silently yield
  * 0.0/0L and corrupt the ranking, so the execs test isNullAt first).
  */
final case class TopKPerKey(
    keys: Seq[Attribute],
    score: Attribute,
    id: Attribute,
    k: Int,
    child: LogicalPlan,
    // constructor parameter (not a body val): plan transforms copy() the
    // node and the output attribute's exprId must survive them
    rankAttr: Attribute = AttributeReference("rank", LongType, nullable = false)()) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(score.dataType == DoubleType, s"score must be double, got ${score.dataType}")
  require(id.dataType == LongType, s"id must be long, got ${id.dataType}")

  override def output: Seq[Attribute] = keys ++ Seq(rankAttr, id, score)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = None
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared bounded-heap logic. Heap dequeues the WORST entry first
  * ((score asc, id desc)) so insertion is O(log k) with k bounded. */
private[plans] object TopKHeap {
  type Entry = (Double, Long, InternalRow) // score, id, carried row
  // PriorityQueue pops its MAX; make the worst entry the max: highest
  // -score (= lowest score), then highest id (id asc wins on ties)
  val worstFirst: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)] { case (s, i, _) => (-s, i) }

  def push(heap: mutable.PriorityQueue[Entry], k: Int, e: Entry): Unit = {
    if (heap.size < k) heap.enqueue(e)
    else {
      val (ws, wi, _) = heap.head
      if (e._1 > ws || (e._1 == ws && e._2 < wi)) { heap.dequeue(); heap.enqueue(e) }
    }
  }

  /** Would (score, id) enter the heap? Callers test this BEFORE building
    * an Entry so the per-row hot path allocates nothing for the ~all rows
    * that lose to the current worst (row.copy() per input row was the
    * measured reason the heap exec lost to sort-based WindowGroupLimit on
    * many-small-groups shapes). */
  def admits(heap: mutable.PriorityQueue[Entry], k: Int, score: Double, id: Long): Boolean =
    heap.size < k || {
      val (ws, wi, _) = heap.head
      score > ws || (score == ws && id < wi)
    }

  /** Best-first (score desc, id asc). */
  def drain(heap: mutable.PriorityQueue[Entry]): Seq[Entry] =
    heap.dequeueAll.reverse.toSeq
}

/** Map-side phase: pass through at most k rows per key per partition
  * (original row layout — it is literally a bounded filter). */
final case class PartialTopKExec(
    keys: Seq[Attribute], score: Attribute, idAttr: Attribute, k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = keys.map(a => child.output.indexWhere(_.exprId == a.exprId))
    val scoreIdx = child.output.indexWhere(_.exprId == score.exprId)
    val idIdx = child.output.indexWhere(_.exprId == idAttr.exprId)
    val keyTypes = keys.map(_.dataType)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyTypes.toArray)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[TopKHeap.Entry]]
      // hot path allocates only on admitted rows: the projection's reused
      // result row serves as the lookup key (UnsafeRow equality is
      // content-based); key.copy()/row.copy() happen only on insert
      val keyVals = new GenericInternalRow(keyIdx.length)
      iter.foreach { row =>
        if (!row.isNullAt(scoreIdx) && !row.isNullAt(idIdx)) { // NULL score/id never ranks
          var j = 0
          while (j < keyIdx.length) {
            keyVals.update(j, row.get(keyIdx(j), child.output(keyIdx(j)).dataType)); j += 1
          }
          val probe = keyProj(keyVals)
          val heap = heaps.get(probe) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[TopKHeap.Entry](TopKHeap.worstFirst)
              heaps.put(probe.copy(), h); h
          }
          val s = row.getDouble(scoreIdx); val i = row.getLong(idIdx)
          if (TopKHeap.admits(heap, k, s, i)) TopKHeap.push(heap, k, (s, i, row.copy()))
        }
      }
      heaps.valuesIterator.flatMap(h => TopKHeap.drain(h).iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: merge per-partition survivors (clustered on the
  * keys) and emit (keys..., rank, id, score). */
final case class FinalTopKExec(
    keys: Seq[Attribute], score: Attribute, idAttr: Attribute, k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = keys ++ Seq(rankAttr, idAttr, score)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = keys.map(a => child.output.indexWhere(_.exprId == a.exprId))
    val scoreIdx = child.output.indexWhere(_.exprId == score.exprId)
    val idIdx = child.output.indexWhere(_.exprId == idAttr.exprId)
    val keyTypes = keys.map(_.dataType)
    val outTypes = output.map(_.dataType)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyTypes.toArray)
      val outProj = UnsafeProjection.create(outTypes.toArray)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[TopKHeap.Entry]]
      val keyVals = new GenericInternalRow(keyIdx.length)
      iter.foreach { row =>
        if (!row.isNullAt(scoreIdx) && !row.isNullAt(idIdx)) { // NULL score/id never ranks
          var j = 0
          while (j < keyIdx.length) {
            keyVals.update(j, row.get(keyIdx(j), child.output(keyIdx(j)).dataType)); j += 1
          }
          val probe = keyProj(keyVals)
          val heap = heaps.get(probe) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[TopKHeap.Entry](TopKHeap.worstFirst)
              heaps.put(probe.copy(), h); h
          }
          val s = row.getDouble(scoreIdx); val i = row.getLong(idIdx)
          // the final phase emits only (keys, rank, id, score) — the
          // carried row is never read, so nothing is copied here
          if (TopKHeap.admits(heap, k, s, i)) TopKHeap.push(heap, k, (s, i, null))
        }
      }
      heaps.iterator.flatMap { case (key, heap) =>
        TopKHeap.drain(heap).iterator.zipWithIndex.map { case ((s, i, _), pos) =>
          val fields = new Array[Any](output.size)
          keys.indices.foreach(j => fields(j) = key.get(j, keyTypes(j)))
          fields(keys.size) = (pos + 1).toLong
          fields(keys.size + 1) = i
          fields(keys.size + 2) = s
          outProj(new GenericInternalRow(fields)).copy()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      FinalTopKExec(t.keys, t.score, t.id, t.k, t.rankAttr,
        PartialTopKExec(t.keys, t.score, t.id, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}
