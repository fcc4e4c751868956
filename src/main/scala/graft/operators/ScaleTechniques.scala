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
}
