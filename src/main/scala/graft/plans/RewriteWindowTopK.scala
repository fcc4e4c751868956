package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: the universal SQL top-k-per-group idiom
  *
  * {{{ row_number().over(partitionBy(g).orderBy(o)) AS rk ... WHERE rk <= k }}}
  *
  * plans as shuffle → full per-group Sort → Window → Filter; on a
  * low-cardinality `g` that concentrates whole groups onto single
  * reducers and sorts them for a k-row answer (the exact scale defect
  * `topk_orders_per_segment` once had). When enabled, this rule replaces
  * the Filter+Window pair with the [[TopKPerGroup]] bounded-heap node —
  * same single shuffle, NO sort, O(groups × k) memory — reusing the rank
  * column's exprId so downstream references resolve unchanged.
  *
  * Opt-in via `spark.graft.rewriteWindowTopK=true`: row_number over a
  * non-total order is tie-nondeterministic by definition, and the heap
  * may keep different (equally valid) tie rows than the sort; the flag
  * records that the session accepts any valid tie choice. Fires only
  * when the Window computes NOTHING but the one row_number (other
  * window columns would be stranded) and the partition spec is
  * non-empty (TopKPerGroup clusters on it).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.rewriteWindowTopK"

  private def enabled: Boolean =
    SQLConf.get.getConfString(FLAG, "false").toBoolean

  /** Window whose single expression is `row_number() AS rk`. */
  private object RowNumberWindow {
    def unapply(p: LogicalPlan)
        : Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] = p match {
      case Window(Seq(al @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _) =>
        // Spark's InsertWindowGroupLimits has already run by the time
        // injected rules apply; its pre-filter node (and the sorts it
        // implies) is subsumed by the heap, so strip it
        val c = child match {
          case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
          case other => other
        }
        Some((al.toAttribute, part, order, c))
      case _ => None
    }
  }

  /** `rk <= k` in any of its spellings, normalized to (rk, k). */
  private object KLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))    => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k))           => Some((a, k - 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute)        => Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1))            => Some((a, 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case Filter(KLimit(rk, k), RowNumberWindow(wAttr, part, order, child))
          if rk.semanticEquals(wAttr) && k >= 1 && part.nonEmpty && order.nonEmpty =>
        TopKPerGroup(part, order, k, wAttr, child)
      case Filter(KLimit(rk, k), Project(list, RowNumberWindow(wAttr, part, order, child)))
          if rk.semanticEquals(wAttr) && k >= 1 && part.nonEmpty && order.nonEmpty &&
            list.forall(_.isInstanceOf[Attribute]) =>
        Project(list, TopKPerGroup(part, order, k, wAttr, child))
    }
}
