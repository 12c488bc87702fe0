package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Logical node: the k best rows per key under `order` (the semantics of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, without
  * the rank column). Carried to the physical [[TopKPerKeyExec]] by
  * [[TopKStrategy]] — graft's whole-operator extension-point demo
  * (`LogicalPlan` + `SparkStrategy` + `SparkPlan`), used where the
  * built-in formulation is structurally wasteful: the window plans
  * Exchange + FULL SORT of every partition, while a bounded heap keeps
  * k rows per key and never sorts the input.
  *
  * `order` must be a TOTAL order (add id tie-breakers) for
  * deterministic output — same contract the window formulation needs
  * for a stable rank.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator.
  * Injected via `SparkSessionExtensions.injectPlannerStrategy` (builder
  * path) or `spark.experimental.extraStrategies` (live session) — both
  * wired in [[graft.functions.GraftExtensions]].
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical per-key top-k: requires clustering on `keys` (the planner
  * inserts one hash Exchange), then a single pass per partition through
  * a hash map of size-k heaps. Memory is O(keys-per-partition × k)
  * rows; the input is NEVER sorted — versus the built-in window plan's
  * Exchange + Sort of the full partition + rank + filter. Each heap
  * evicts its worst row on a better arrival; output rows emit sorted
  * within their key (deterministic given a total `order`).
  */
final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // rows stay where the required clustering put them, and the default
  // (UnknownPartitioning) would make a following same-key operator —
  // a window ranking the retained rows, a per-key aggregate — re-shuffle
  // what is already co-located
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { iter =>
      // per-partition construction: projections and orderings are not
      // thread-safe/serializable
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // heap head = the WORST retained row (max under the ranking order)
      val heapOrd: Ordering[InternalRow] = ordering
      val heaps = mutable.LinkedHashMap.empty[
        UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // PQ drains worst-first → reverse
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
