package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks natively — as-of and range
  * (interval) joins — in their scalable single-shuffle formulations
  * (north-star custom operators; the reference has no joins at all).
  *
  * Scale notes:
  *   - The as-of join is the union-merge form: tag both inputs, union
  *     (no join at all!), one shuffle on the key, and a running
  *     last-non-null window carries the most recent right row onto each
  *     left row. No inequality join, no per-key explosion — this is how
  *     you as-of-join two 100 TB tables.
  *   - The range join buckets time into interval-width cells and
  *     equi-joins on (key, cell) with a +/-1 cell probe, so each
  *     candidate pair is produced exactly once and the join stays a hash
  *     join on compact keys; the |dt| filter runs post-join on the
  *     narrow candidate set.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single most recent right row of
    * the same key with `ts_right <= ts_left` (ties: max event_id).
    * Inputs are (key, us, id) + payload-free for clarity; output keeps
    * left rows (left-outer semantics), appending prev_id + gap_us.
    */
  def asofPrev(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("key"), col("us"), col("id"),
      lit(0).as("is_right"), lit(null).cast("long").as("r_id"))
    val r = right.select(col("key"), col("us"), col("id"),
      lit(1).as("is_right"), col("id").as("r_id"))
    // rights sort before lefts at equal ts (inclusive match), and among
    // equal-ts rights the largest id lands last -> last() picks it
    val merged = l.unionByName(r)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("us").asc, col("is_right").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("prev_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("prev_us", last(when(col("is_right") === 1, col("us")),
        ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("key"), col("id"), col("us"),
        col("prev_id"), (col("us") - col("prev_us")).as("gap_us"))
  }

  /** Declared query: each 'error' event joined to the user's most
    * recent preceding 'click' event.
    */
  def asofErrorClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
        col("event_id").as("id"), col("event_type"))
    asofPrev(
      ev.filter(col("event_type") === "error").drop("event_type"),
      ev.filter(col("event_type") === "click").drop("event_type"))
      .select(col("id").as("event_id"), col("key").as("user_id"),
        col("us").as("ts_us"), col("prev_id").as("prev_click_id"),
        col("gap_us"))
  }

  /** Forward as-of with tolerance (pandas merge_asof direction=forward):
    * for every left row, the single EARLIEST right row of the same key
    * with `us_right >= us_left` and gap <= `tolUs` (ties: min event id).
    * Same single-shuffle union-merge form as [[asofPrev]], scanned
    * descending; the tolerance nulls the match post-scan, which is
    * equivalent to filtering candidates (the nearest-following right is
    * minimal-gap — anything else is even farther).
    */
  def asofNext(left: DataFrame, right: DataFrame, tolUs: Long): DataFrame = {
    val l = left.select(col("key"), col("us"), col("id"),
      lit(0).as("is_right"), lit(null).cast("long").as("r_id"))
    val r = right.select(col("key"), col("us"), col("id"),
      lit(1).as("is_right"), col("id").as("r_id"))
    // descending scan: rights sort before lefts at equal ts (inclusive
    // match) and among equal-ts rights the SMALLEST id lands last ->
    // last() picks it
    val w = Window.partitionBy(col("key"))
      .orderBy(col("us").desc, col("is_right").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("next_id_raw", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("next_us_raw", last(when(col("is_right") === 1, col("us")),
        ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .withColumn("gap_raw", col("next_us_raw") - col("us"))
      .select(col("key"), col("id"), col("us"),
        when(col("gap_raw") <= tolUs, col("next_id_raw")).as("next_id"),
        when(col("gap_raw") <= tolUs, col("gap_raw")).as("gap_us"))
  }

  /** Declared query: each 'error' event joined to the user's next
    * 'click' within 10 minutes (forward as-of + tolerance).
    */
  def asofNextErrorClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("us"),
        col("event_id").as("id"), col("event_type"))
    asofNext(
      ev.filter(col("event_type") === "error").drop("event_type"),
      ev.filter(col("event_type") === "click").drop("event_type"),
      600L * 1000000L)
      .select(col("id").as("event_id"), col("key").as("user_id"),
        col("us").as("ts_us"), col("next_id").as("next_click_id"),
        col("gap_us"))
  }

  /** Range self-join: pairs of same-key rows within `intervalUs` of each
    * other (id_a < id_b), via interval-width time cells and a
    * {-1, 0, +1} cell probe. Input: (key, us, id).
    */
  def withinInterval(rows: DataFrame, intervalUs: Long): DataFrame = {
    // exact integer cells: |dt| <= interval implies cell diff in
    // {-1,0,1}, so the 3-probe equi-join finds each pair exactly once
    // (b sits in its own cell; only one of a's probes hits it)
    val a = rows.select(col("key"), col("us").as("us_a"), col("id").as("id_a"))
      .withColumn("cell_a", expr(s"us_a DIV $intervalUs"))
      .withColumn("off", explode(sequence(lit(-1), lit(1))))
      .withColumn("cell", col("cell_a") + col("off"))
    val b = rows.select(col("key"), col("us").as("us_b"), col("id").as("id_b"))
      .withColumn("cell", expr(s"us_b DIV $intervalUs"))
    a.join(b, Seq("key", "cell"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= intervalUs)
      .select(col("key"), col("id_a"), col("id_b"),
        abs(col("us_a") - col("us_b")).as("gap_us"))
  }

  /** Declared query: same-user event pairs within 5 minutes. */
  def eventsWithin5min(spark: SparkSession, dir: String): DataFrame =
    withinInterval(
      Tables.events(spark, dir).select(col("user_id").as("key"),
        unix_micros(col("ts")).as("us"), col("event_id").as("id")),
      300L * 1000000L)
      .select(col("key").as("user_id"), col("id_a").as("event_a"),
        col("id_b").as("event_b"), col("gap_us"))
}
