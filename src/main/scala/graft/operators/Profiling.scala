package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum._

/** Dataset profiling — the per-column statistics pass (row count,
  * non-null count, exact distinct count, min/max) every ingestion
  * pipeline runs before trusting a new drop of data. One declarative
  * plan per table; the output is the long-form (column, stats) relation
  * a catalog stores.
  *
  * Scale notes (100 TB thinking):
  *   - ONE scan: all columns profile in a single aggregation pass;
  *     Catalyst plans the multiple DISTINCT aggregates via `Expand`
  *     (one grouping per distinct column) — the standard trade: the
  *     shuffle carries |columns| expanded copies of the distinct keys
  *     only, and every non-distinct stat partial-aggregates map-side.
  *     At petabyte scale swap `countDistinct` for
  *     `approx_count_distinct` — same plan minus the expand.
  *   - The wide 1-row aggregate unpivots to long form via `stack`
  *     (map-only, driver never sees data).
  *   - Engine-portable representations: doubles profile as exact
  *     integer cents, timestamps as epoch days, so min/max stringify
  *     identically in Spark and the oracle (SURVEY.md §7.4).
  */
object Profiling {

  /** Profile of the `orders` table: one row per column. */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      cents(col("o_totalprice")).as("o_totalprice_cents"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("o_orderdate_epday"),
      col("o_orderpriority"))
    profile(o)
  }

  /** Generic single-pass profile: (column_name, n_rows, n_nonnull,
    * n_distinct, min_repr, max_repr), one output row per input column.
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    val wide = df.agg(count(lit(1)).as("n_rows"),
      aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`").mkString(", ")
    wide.selectExpr("n_rows",
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_nonnull, n_distinct, min_repr, max_repr)")
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_repr"), col("max_repr"))
  }
}
