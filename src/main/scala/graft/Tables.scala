package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  * Filters/projections applied downstream push into these scans
  * (verify with .explain: PushedFilters / ReadSchema).
  */
object Tables {
  /** The fixtures write timestamps with isAdjustedToUTC=false, which
    * Spark 4 infers as TIMESTAMP_NTZ — a type that rejects arithmetic
    * with TIMESTAMP literals and epoch casts used throughout the
    * declared queries. Every session here runs in UTC, so casting the
    * wall-clock NTZ value to the session type preserves the exact
    * instant (and matches DuckDB, whose native TIMESTAMP is naive µs).
    * Cast applied per-column only when the scan actually infers NTZ,
    * so fixtures written either way load identically.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.select(df.schema.fieldNames.map { f =>
      if (ntz.exists(_.name == f)) col(f).cast(TimestampType).as(f)
      else col(f)
    }.toIndexedSeq: _*)
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** Earlier fixture generations wrote events.ts as parquet
    * TIMESTAMP(NANOS), which Spark 4 rejects (SPARK-40819) — those load
    * as long under the legacy flag and truncate to microseconds with
    * integer division (ns epochs ~1.7e18 exceed double's 2^53 exact
    * range, so the conversion must never round-trip through a double).
    * Current generations write µs timestamps, which [[load]] already
    * normalizes; dispatch on the inferred type so both vintages read
    * to the identical µs TIMESTAMP column DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
