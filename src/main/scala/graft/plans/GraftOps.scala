package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}

/** User-facing entry points for graft's custom operators. */
object GraftOps {

  /** Top-k rows per group with a dense 1..k rank column, executed by
    * [[TopKPerGroupExec]] (per-group bounded heaps; one shuffle on the
    * group keys). `orderCols` are (name, ascending) pairs. Drop-in for
    * the window form `row_number().over(partitionBy(group).orderBy(
    * order)) <= k`.
    *
    * Columns are resolved by name against the input directly: Spark 4
    * Columns carry ColumnNode wrappers the analyzer only unwraps inside
    * built-in operators, so a custom logical node must bind real
    * attributes itself.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      rkName: String = "rk", partialFirst: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    GraftExtensions.installStrategy(spark)
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute =
      child.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val groups = groupCols.map(attr)
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    // two-phase form for low-cardinality groups: a map-side heap prune
    // (no shuffle; <= groups x k survivors per input partition) so the
    // clustering shuffle below carries candidates, not the whole table
    val pruned: LogicalPlan =
      if (!partialFirst) child
      else Project(child.output,
        TopKPerGroup(groups, order, k,
          TopKPerGroup.rankAttribute("_partial_" + rkName), child,
          partial = true))
    val node = TopKPerGroup(groups, order, k,
      TopKPerGroup.rankAttribute(rkName), pruned)
    GraftColumn.ofRows(spark, node)
  }
}
