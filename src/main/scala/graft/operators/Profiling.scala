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
  *   - One aggregation branch PER COLUMN, unioned: on columnar storage
  *     each branch's scan prunes to exactly its column (total IO = the
  *     table read once across all branches, in parallel), and each
  *     single-distinct aggregate plans as a plain two-phase
  *     dedupe+count — no `Expand` blowup. The alternative single-scan
  *     form (all distincts in one aggregate) multiplies every row
  *     |columns|+1 times through Expand before the shuffle; measured
  *     ~4x slower at sf0.1 on 6 columns, and the gap widens with
  *     column count.
  *   - At petabyte scale swap `countDistinct` for
  *     `approx_count_distinct` — same plan minus the exact dedupe.
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

  /** Generic per-column profile: (column_name, n_rows, n_nonnull,
    * n_distinct, min_repr, max_repr), one output row per input column.
    */
  def profile(df: DataFrame): DataFrame =
    df.columns.toSeq.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_repr"),
        max(col(c)).cast("string").as("max_repr"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_repr"), col("max_repr"))
    }.reduce(_.unionByName(_))
}
