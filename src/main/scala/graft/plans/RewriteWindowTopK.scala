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
  * Firing policy (`spark.graft.rewriteWindowTopK`, default `auto`):
  * row_number over a non-total order is tie-nondeterministic by
  * definition, and the heap may keep different (equally valid) tie rows
  * than the sort. Under `auto` the rule fires exactly when that cannot
  * matter: every column of the child either appears as a plain
  * attribute in the ORDER BY (so tied rows agree on it) or is a plain
  * partition key (constant within the group) — then any two rows the
  * heap and the sort could disagree on are value-identical, and the
  * rewrite is observationally safe. `true` forces the rewrite on any
  * ordering (the session accepts any valid tie choice); `false`
  * disables it. Fires only when the Window computes NOTHING but the one
  * row_number (other window columns would be stranded) and the
  * partition spec is non-empty (TopKPerGroup clusters on it).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.rewriteWindowTopK"

  private def mode: String = {
    val m = SQLConf.get.getConfString(FLAG, "auto")
      .toLowerCase(java.util.Locale.ROOT)
    // fail loudly on typos: silently treating "on"/"1"/"force" as auto
    // would ignore the user's stated intent without a trace
    require(m == "auto" || m == "true" || m == "false",
      s"$FLAG must be auto, true, or false (got '$m')")
    m
  }

  /** Ties under `order` are value-identical rows: each child column is
    * either ordered on directly or a plain partition key. Expression
    * order keys (e.g. `f(x)`) pin nothing — rows tied on `f(x)` may
    * still differ in `x` — so only bare attributes count.
    */
  private def totalOrder(part: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan): Boolean = {
    val pinned = AttributeSet(
      order.map(_.child).collect { case a: Attribute => a } ++
        part.collect { case a: Attribute => a })
    child.outputSet.subsetOf(pinned)
  }

  /** Window whose single expression is `row_number() AS rk`. */
  private object RowNumberWindow {
    def unapply(p: LogicalPlan)
        : Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] = p match {
      case Window(Seq(al @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _) =>
        Some((al.toAttribute, part, order, child))
      case _ => None
    }
  }

  /** Spark's InsertWindowGroupLimits has already run by the time
    * injected rules apply; its pre-filter nodes (and the sorts they
    * force at execution) are subsumed by the heap, so strip every
    * WindowGroupLimit that prunes the SAME (partition, order) top-k —
    * Catalyst's decorrelated LATERAL ... LIMIT k form stacks TWO of
    * them around a pushed-down partition-key filter
    * (`lateral_top_orders`). Recursing through a Filter is safe only
    * when its condition references nothing but partition keys (it then
    * keeps or drops whole groups, so it commutes with per-group
    * pruning); a filter on any other column could remove rows WGL
    * already discarded alternatives for, and must block the strip.
    */
  private def stripGroupLimits(p: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], k: Int): LogicalPlan = p match {
    case WindowGroupLimit(gPart, gOrder, _: RowNumber, limit, gc)
        if limit >= k && gPart.length == part.length &&
          gPart.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
          gOrder.length == order.length &&
          gOrder.zip(order).forall { case (a, b) => a.semanticEquals(b) } =>
      stripGroupLimits(gc, part, order, k)
    case f @ Filter(cond, c)
        if cond.references.subsetOf(AttributeSet(part.flatMap(_.references))) =>
      val stripped = stripGroupLimits(c, part, order, k)
      if (stripped eq c) f else Filter(cond, stripped)
    case other => other
  }

  /** The rewrite target: a map-side partial heap (no required
    * distribution -> no shuffle; emits <= groups x k rows per input
    * partition) feeding the final clustered heap — the same two-phase
    * shape Spark's own Partial/Final WindowGroupLimit pair had, minus
    * the sorts both its halves require.
    */
  private def heapForm(part: Seq[Expression], order: Seq[SortOrder], k: Int,
      rkAttr: Attribute, child: LogicalPlan): LogicalPlan = {
    val pruned = Project(child.output,
      TopKPerGroup(part, order, k,
        TopKPerGroup.rankAttribute("_partial_" + rkAttr.name), child,
        partial = true))
    TopKPerGroup(part, order, k, rkAttr, pruned)
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == "false") plan
    else {
      def fires(part: Seq[Expression], order: Seq[SortOrder],
          child: LogicalPlan): Boolean =
        m == "true" || totalOrder(part, order, child)
      plan.transform {
        case Filter(KLimit(rk, k), RowNumberWindow(wAttr, part, order, raw))
            if rk.semanticEquals(wAttr) && k >= 1 && part.nonEmpty &&
              order.nonEmpty && fires(part, order, raw) =>
          heapForm(part, order, k, wAttr,
            stripGroupLimits(raw, part, order, k))
        case Filter(KLimit(rk, k), Project(list, RowNumberWindow(wAttr, part, order, raw)))
            if rk.semanticEquals(wAttr) && k >= 1 && part.nonEmpty &&
              order.nonEmpty && list.forall(_.isInstanceOf[Attribute]) &&
              fires(part, order, raw) =>
          Project(list, heapForm(part, order, k, wAttr,
            stripGroupLimits(raw, part, order, k)))
      }
    }
  }
}
