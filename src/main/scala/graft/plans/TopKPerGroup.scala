package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator (SURVEY.md §4.3's planned
  * custom physical op): `row_number().over(partitionBy(g).orderBy(o))
  * <= k` forces a full sort of every group, while top-k only needs a
  * k-bounded heap per group. This node keeps the heap form all the way
  * to execution.
  *
  * Scale notes: requiredChildDistribution declares clustering on the
  * group keys, so Catalyst inserts exactly one hash shuffle (same as the
  * window) — but per partition we stream rows into per-group heaps of at
  * most k entries instead of buffering + sorting whole groups. Memory is
  * O(groups x k) regardless of group size — the difference between a
  * sort-spill and a streaming pass when one group holds a billion rows.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rkAttr: Attribute,
    child: LogicalPlan,
    partial: Boolean = false) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rkAttr

  // rk is synthesized here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rkAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** `partial = true` is the map-side half of a two-phase top-k: it runs
  * the same per-group heaps over whatever partitioning the child already
  * has (no required distribution, so NO shuffle is inserted) and emits at
  * most groups x k rows per partition. Feeding that into a final
  * (partial = false) node means the clustering shuffle carries only the
  * pruned candidates — for low-cardinality groups (5 market segments)
  * that is the difference between shuffling the whole fact table onto 5
  * reducers and shuffling partitions x 5 x k rows. Its rank column is an
  * intra-partition artifact; callers drop it before the final pass.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rkAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rkAttr

  override def producedAttributes: AttributeSet = AttributeSet(rkAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = RowOrdering.create(orderExprs, childOutput)
      // max-heap by the sort order: head is the current worst of the k
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty(ordering))
        if (heap.size < kLocal) heap += row.copy()
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields worst-first; reverse to ascending rank order
        val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }
      }
    }
  }
}

object TopKPerGroup {
  def rankAttribute(name: String): Attribute =
    AttributeReference(name, IntegerType, nullable = false)()
}

/** Plans the logical node; installed via [[GraftExtensions]]. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rk, child, partial) =>
      TopKPerGroupExec(g, o, k, rk, planLater(child), partial) :: Nil
    case _ => Nil
  }
}
