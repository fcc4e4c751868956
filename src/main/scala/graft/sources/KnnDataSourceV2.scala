package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Data Source V2 binding of the kNN backends (same option surface as
  * the DSv1 [[KnnDataSource]], same [[KnnBackends]] switch) — the V2
  * contracts add what V1's `TableScan` cannot express at the source
  * boundary:
  *
  *   - '''column pruning''' (`SupportsPushDownRequiredColumns`): a
  *     `SELECT vec_id FROM knn` never carries `dist`/`rk` out of the
  *     scan;
  *   - '''filter pushdown''' (`SupportsPushDownFilters`): `WHERE qid =
  *     475` lands inside the source's plan, where Catalyst can then
  *     push it through the search join to prune per-query work —
  *     instead of filtering the full batch result above the scan.
  *
  * {{{
  * CREATE TEMPORARY VIEW knn
  * USING graft.sources.KnnDataSourceV2
  * OPTIONS (dir '/data/sf0.01', backend 'exact_batch', k '10')
  * SELECT vec_id FROM knn WHERE qid = 475
  * }}}
  *
  * Execution rides the `V1Scan` bridge (Spark's published migration
  * path): pushdown is negotiated on the V2 contracts, then the pruned/
  * filtered DataFrame executes through a V1 relation — fully
  * distributed, nothing materialized on the driver. Pushing into the
  * RESULT frame is always semantics-preserving (the pushed predicate is
  * a residual-free filter over the backend's declared output), so
  * correctness never depends on which filters Spark offers.
  */
class KnnDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-knn-v2"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KnnBackends.frame(SparkSession.active,
      options.asCaseSensitiveMap.asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KnnTableV2(properties.asScala.toMap)
}

/** V2 table over one backend's result frame; scans negotiate pruning
  * and pushdown per query.
  */
private[sources] class KnnTableV2(params: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    s"graft-knn-v2(${params.getOrElse("backend", "exact")})"

  override def schema(): StructType =
    KnnBackends.frame(SparkSession.active, params).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KnnScanBuilderV2(params)
}

/** Per-query scan negotiation: Spark calls `pushFilters` then
  * `pruneColumns`, and `build` captures the composed frame.
  */
private[sources] class KnnScanBuilderV2(params: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownTopN with SupportsPushDownLimit {

  private var frame: DataFrame =
    KnnBackends.frame(SparkSession.active, params)
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed = false
  private var topNPushed = false

  /** Accept the filters expressible as Column predicates over the
    * result frame; anything else stays residual (Spark re-applies it
    * above the scan — correct either way, pushdown is an optimization
    * contract, not a correctness one).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(translate(_).isDefined)
    sup.foreach(f => frame = frame.filter(translate(f).get))
    pushed = sup
    unsup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // after an aggregate pushdown the frame already IS the minimal
    // aggregated relation (and Spark's requested names are its own
    // aggregate aliases — matched by position, not name)
    if (!aggPushed && requiredSchema.fields.nonEmpty &&
        requiredSchema.fieldNames.toSeq != frame.schema.fieldNames.toSeq)
      frame = frame.select(requiredSchema.fieldNames.map(col).toSeq: _*)

  /** '''Aggregate pushdown''' (`SupportsPushDownAggregates`): a
    * `SELECT count(*)/min/max FROM knn` collapses INSIDE the source to
    * a one-row relation — the scan ships a single row instead of the
    * whole result frame (the cardinality/operating-stats queries a
    * serving tier runs constantly). Complete pushdown: group-free
    * COUNT(*), COUNT(col), MIN, MAX; anything else is declined and
    * Spark aggregates above the scan as before (pushdown stays an
    * optimization contract, never a correctness dependency).
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAgg(agg) match {
      case Some(cols) =>
        frame = frame.agg(cols.head, cols.tail: _*)
        aggPushed = true
        true
      case None => false
    }

  /** '''Top-N pushdown''' (`SupportsPushDownTopN`): `ORDER BY dist
    * LIMIT k` collapses INTO the scan — the serving tier's "best k by
    * distance" never plans a Sort or TakeOrderedAndProject above the
    * source (KnnDataSourceSpec pins the shape). COMPLETE pushdown
    * (`isPartiallyPushed = false`): the source frame's
    * `orderBy(...).limit(k)` IS the exact global top-N (Catalyst plans
    * it as a distributed TakeOrderedAndProject inside the bridged
    * scan), so Spark drops its own sort+limit entirely. Declined — and
    * planned above the scan as before — for orders over anything but
    * plain columns, or after an aggregate push.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (aggPushed || topNPushed) return false
    val cols = orders.toSeq.map(translateSortOrder)
    if (cols.isEmpty || cols.exists(_.isEmpty)) return false
    frame = frame.orderBy(cols.map(_.get): _*).limit(limit)
    topNPushed = true
    true
  }

  /** Bare `LIMIT n` (no ordering) also collapses into the scan; any n
    * rows satisfy it, so the source's own limit is complete.
    */
  override def pushLimit(limit: Int): Boolean = {
    if (aggPushed || topNPushed) return false
    frame = frame.limit(limit)
    topNPushed = true
    true
  }

  override def isPartiallyPushed: Boolean = false

  private def translateSortOrder(o: SortOrder)
      : Option[org.apache.spark.sql.Column] = o.expression() match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      val c = col(nr.fieldNames.head)
      Some((o.direction(), o.nullOrdering()) match {
        case (SortDirection.ASCENDING, NullOrdering.NULLS_FIRST) =>
          c.asc_nulls_first
        case (SortDirection.ASCENDING, _) => c.asc_nulls_last
        case (_, NullOrdering.NULLS_FIRST) => c.desc_nulls_first
        case _ => c.desc_nulls_last
      })
    case _ => None
  }

  private def translateAgg(agg: Aggregation)
      : Option[Seq[org.apache.spark.sql.Column]] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val cols = agg.aggregateExpressions().toSeq.map(translateAggFunc)
    if (cols.nonEmpty && cols.forall(_.isDefined)) Some(cols.map(_.get))
    else None
  }

  private def translateAggFunc(f: AggregateFunc)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    f match {
      case _: CountStar => Some(count(lit(1)))
      case c: Count if !c.isDistinct => fieldOf(c.column).map(n => count(col(n)))
      case m: Min => fieldOf(m.column).map(n => min(col(n)))
      case m: Max => fieldOf(m.column).map(n => max(col(n)))
      case _ => None
    }
  }

  override def build(): Scan = {
    val df = frame
    val pf = pushed
    val pa = aggPushed
    val pt = topNPushed
    new V1Scan {
      override def readSchema(): StructType = df.schema
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new KnnV1BridgeRelation(context, df, pf, pa, pt).asInstanceOf[T]
    }
  }

  private def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNotNull(a) => Some(col(a).isNotNull)
    case IsNull(a) => Some(col(a).isNull)
    case And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}

/** The executing end of the V1Scan bridge. Named (not anonymous) so
  * specs can locate it in the executed plan and assert the negotiated
  * `pushedFilters` made it into the scan.
  */
private[sources] class KnnV1BridgeRelation(ctx: SQLContext, df: DataFrame,
    val pushedFilters: Array[Filter],
    val pushedAggregation: Boolean = false,
    val pushedTopN: Boolean = false)
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
  override def toString: String =
    s"KnnV1BridgeRelation(pushed=[${pushedFilters.mkString(", ")}]" +
      (if (pushedAggregation) ", aggPushed" else "") +
      (if (pushedTopN) ", topNPushed" else "") + ")"
}
