package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum._

/** Skew-handling techniques as first-class operators.
  *
  * Salting: a hot grouping key (here event_type — 5 values over every
  * row) concentrates each group on one reducer. The salted form spreads
  * each group over `salts` sub-keys in a first shuffle, then combines
  * the per-salt partials in a second, tiny shuffle (salts x groups
  * rows). Identical results to the direct aggregation — integer-cent
  * sums are order-independent — which the DuckDB oracle checks with a
  * plain GROUP BY.
  *
  * (For joins, the analogous trick replicates the small side per salt;
  * AQE's skew-join split automates this for sort-merge joins at runtime.)
  */
object ScaleTechniques {

  /** Two-stage salted aggregation per event_type. Output:
    * (event_type, n, sum_value) — same as the unsalted groupBy.
    */
  def saltedEventAgg(spark: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(cents(col("value"))).as("pc"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), (sum(col("pc")) / 100.0).as("sum_value"))

  /** Morton (Z-order) value of two non-negative integer columns: the
    * low `bits` bits of each, interleaved (x in even positions, y in
    * odd). A pure Column fold — 2×`bits` shift/mask/or terms, all inside
    * whole-stage codegen; no UDF.
    */
  def zorderValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Multi-dimensional clustering: write `df` range-partitioned AND
    * sorted by the Morton value of (xCol, yCol), so every output file
    * covers a small 2-D tile. Parquet min/max stats on BOTH columns
    * then prune a 2-D box predicate to the few overlapping tiles —
    * whereas a 1-D sort gives selectivity on its leading column only.
    * At 100 TB this is the table-layout lever for workloads that filter
    * on two independent dimensions (user × time, key × date): no index
    * structure, just row order; any engine reading the files benefits.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int = 16, bits: Int = 16): Unit = {
    val z = zorderValue(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) envelopes of two columns — the pruning model a
    * stats-based reader applies: a file whose envelope misses the query
    * box is never read. Used by the spec to show the Z-order layout
    * touches fewer files than a 1-D sort for the same box predicate.
    */
  def fileEnvelopes(spark: SparkSession, path: String, xCol: String,
      yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(xCol).as("xmin"), max(xCol).as("xmax"),
        min(yCol).as("ymin"), max(yCol).as("ymax"))
}
