package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** LSH bucket → candidate pairs as a first-class operator (SURVEY §8
  * candidate (a)).
  *
  * The declarative route to "all id pairs sharing a bucket" is a self-join
  * on the bucket key: two reads of the banded table (one exchange, reused),
  * a hash build + probe per partition, and a wide matched row carrying both
  * band columns that is immediately projected away. This operator subsumes
  * the join: after ONE exchange clustered on the bucket key it buffers each
  * bucket's ids, sorts them, and streams out the C(n,2) ordered pairs
  * directly — no build/probe, no wide intermediate, and pair emission is an
  * iterator (never materialized per bucket).
  *
  * Cross-band duplicate pairs still require the downstream `.distinct()`
  * (a pair colliding in two bands is emitted once per band; which bands
  * collide is not partition-local knowledge).
  *
  * Scale guard: a degenerate bucket (e.g. the all-zeros band of near-empty
  * documents) contributes C(n,2) pairs — quadratic in the bucket, the
  * classic LSH whale. `maxBucket > 0` drops buckets larger than the cap,
  * bounding any bucket's output at C(maxBucket,2); standard practice for
  * corpus-scale LSH, surfaced as an explicit, documented knob (0 = exact).
  *
  * Semantics: pairs (id_a < id_b); rows with a NULL id OR a NULL bucket
  * key are skipped (SQL join equality never matches NULL keys, and this
  * operator keeps the self-join's result exactly); duplicate ids within
  * one bucket collapse (a pair is two DISTINCT ids sharing the bucket).
  * Bucket keys compare by binary row equality — use integral/string/
  * binary keys; float/double keys would split -0.0 from 0.0 where SQL
  * equality merges them, so they are rejected up front.
  */
final case class BandedPairs(
    keys: Seq[Attribute],
    id: Attribute,
    maxBucket: Int,
    child: LogicalPlan,
    // constructor parameters so exprIds survive plan-transform copy()
    idA: Attribute = AttributeReference("id_a", LongType, nullable = false)(),
    idB: Attribute = AttributeReference("id_b", LongType, nullable = false)()) extends UnaryNode {
  require(id.dataType == LongType, s"id must be long, got ${id.dataType}")
  require(maxBucket == 0 || maxBucket >= 2, "maxBucket must be 0 (unbounded) or >= 2")
  keys.foreach(k => require(!BandedPairs.containsFloat(k.dataType),
    s"bucket key ${k.name}: floating-point keys (incl. nested in structs/arrays) compare " +
      "by raw bits here (-0.0 vs 0.0 would split buckets SQL equality merges) — hash or cast first"))

  override def output: Seq[Attribute] = Seq(idA, idB)
  override def producedAttributes: AttributeSet = AttributeSet(Seq(idA, idB))
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object BandedPairs {
  import org.apache.spark.sql.types._
  /** Any float/double anywhere in the type tree (existsRecursively is
    * private[sql]). */
  private[plans] def containsFloat(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
    case a: ArrayType => containsFloat(a.elementType)
    case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
    case _ => false
  }
}

/** Physical: cluster on the bucket key AND sort within the partition by
  * it (requiredChildOrdering — the upstream sort is Spark's spillable
  * UnsafeExternalSorter), then stream consecutive equal-key runs. Peak
  * operator memory is ONE bucket's ids, not the partition's — a skewed
  * band value cannot OOM the task; the quadratic-output whale case is the
  * `maxBucket` cap's job. */
final case class BandedPairsExec(
    keys: Seq[Attribute], idAttr: Attribute, maxBucket: Int,
    idA: Attribute, idB: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = Seq(idA, idB)
  override def producedAttributes: AttributeSet = AttributeSet(Seq(idA, idB))
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]] =
    Seq(keys.map(org.apache.spark.sql.catalyst.expressions.SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = keys.map(a => child.output.indexWhere(_.exprId == a.exprId))
    val idIdx = child.output.indexWhere(_.exprId == idAttr.exprId)
    val keyTypes = keys.map(_.dataType)
    val childTypes = child.output.map(_.dataType)
    val cap = maxBucket
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyTypes.toArray)
      val outProj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType, LongType))

      def keyOf(row: InternalRow): UnsafeRow = {
        val keyVals = new GenericInternalRow(keyIdx.map(i => row.get(i, childTypes(i))).toArray)
        keyProj(keyVals).copy()
      }

      def pairsOf(ids: mutable.ArrayBuffer[Long]): Iterator[InternalRow] = {
        val arr = ids.distinct.toArray
        java.util.Arrays.sort(arr)
        if (cap > 0 && arr.length > cap) Iterator.empty
        else
          for {
            i <- arr.indices.iterator
            j <- Iterator.range(i + 1, arr.length)
          } yield outProj(new GenericInternalRow(Array[Any](arr(i), arr(j)))).copy(): InternalRow
      }

      // stream equal-key runs off the sorted input; one bucket in memory
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var lookahead: Option[(UnsafeRow, Long)] = None
        private def refill(): Unit = {
          while (!pending.hasNext && (lookahead.isDefined || iter.hasNext)) {
            var run: Option[(UnsafeRow, mutable.ArrayBuffer[Long])] =
              lookahead.map { case (k, id) => (k, mutable.ArrayBuffer(id)) }
            lookahead = None
            var runOpen = true
            while (runOpen && iter.hasNext) {
              val row = iter.next()
              // NULL id or NULL bucket key can never pair (join equality)
              if (!row.isNullAt(idIdx) && !keyIdx.exists(row.isNullAt)) {
                val k = keyOf(row)
                val id = row.getLong(idIdx)
                run match {
                  case Some((rk, ids)) if rk == k => ids += id
                  case Some(_) => lookahead = Some((k, id)); runOpen = false
                  case None => run = Some((k, mutable.ArrayBuffer(id)))
                }
              }
            }
            pending = run.map(r => pairsOf(r._2)).getOrElse(Iterator.empty)
          }
        }
        override def hasNext: Boolean = { refill(); pending.hasNext }
        override def next(): InternalRow = { refill(); pending.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[BandedPairs]]; EnsureRequirements inserts the bucket-key
  * exchange demanded by requiredChildDistribution. */
object BandedPairsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case b: BandedPairs =>
      BandedPairsExec(b.keys, b.id, b.maxBucket, b.idA, b.idB, planLater(b.child)) :: Nil
    case _ => Nil
  }
}
