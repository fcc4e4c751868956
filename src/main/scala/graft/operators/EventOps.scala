package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum._

/** Event-time processing over the `events` fixture (SURVEY.md §2.11 —
  * the reference has no streaming surface; these are the north-star
  * extensions). All four run as batch plans here; the tumbling/sliding
  * aggregations use the exact same `window()` expressions that run
  * unchanged under Structured Streaming (see graft.streaming).
  *
  * Scale notes: each is a single shuffle on the grouping key; window
  * assignment (`window`, `lag`) happens before the shuffle carries only
  * (key, counters) pairs. Session detection is the lag/flag/prefix-sum
  * formulation — one shuffle on user_id, no driver-side state.
  */
object EventOps {

  /** Window aggregation shared verbatim by batch and streaming plans
    * (graft.streaming.EventStream applies it after withWatermark).
    */
  def windowedAgg(events: DataFrame, width: String, slide: Option[String]): DataFrame = {
    val w = slide.fold(window(col("ts"), width))(s => window(col("ts"), width, s))
    events
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Tumbling 10-minute windows: count + exact value sum per type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(spark, dir), "10 minutes", None)

  /** Sliding windows: 10-minute width, 5-minute slide (each event lands
    * in exactly two windows).
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(spark, dir), "10 minutes", Some("5 minutes"))

  /** Session windows per user with a 30-minute inactivity gap, via the
    * lag/flag/prefix-sum island pattern (deterministic: window ordered by
    * (ts, event_id)). Output: one row per session.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          // microsecond-exact gap compare (unix_timestamp would truncate
          // to seconds and disagree with the oracle's interval compare)
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("sid"))
      .agg(unix_micros(min(col("ts"))).as("session_start_us"),
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
  }

  /** The same 30-minute sessions through Spark's NATIVE session_window
    * operator (one shuffle on user_id, sessions merged inside the
    * aggregation — no analytic-window pass). Equals [[sessions]] minus
    * the sid column whenever no inter-event gap is EXACTLY the gap
    * duration (the two formulations split ties differently; the fixture
    * has no such tie, and the shared oracle pins the equality).
    */
  def sessionsNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(unix_micros(min(col("ts"))).as("session_start_us"),
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select("user_id", "session_start_us", "n_events", "sum_value")

  /** Exact interpolated quantiles per event type, computed on integer
    * cents so interpolation happens on exact inputs (engine-portable:
    * Spark percentile and DuckDB quantile_cont share the linear
    * R-7 interpolation).
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("c"))
      .groupBy(col("event_type"))
      .agg(round(percentile(col("c"), lit(0.5)) / 100.0, 6).as("p50"),
        round(percentile(col("c"), lit(0.9)) / 100.0, 6).as("p90"),
        (max(col("c")) / 100.0).as("max_value"))

  /** The mergeable-sketch twin of [[valueQuantiles]] — at 100 TB the
    * exact per-group sort is the wrong plan; `percentile_approx`'s
    * sketch partial-aggregates map-side and merges associatively, so
    * the shuffle carries one bounded sketch per (partition, type)
    * instead of every value. Rank error ≤ 1/accuracy; approximate, so
    * declared rows-only — EventOpsSpec gates the rank error against
    * the exact quantiles.
    */
  def valueQuantilesApprox(spark: SparkSession, dir: String,
      accuracy: Int = 1000): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("c"))
      .groupBy(col("event_type"))
      .agg(
        round(percentile_approx(col("c"), lit(0.5), lit(accuracy)) / 100.0, 6)
          .as("p50"),
        round(percentile_approx(col("c"), lit(0.9), lit(accuracy)) / 100.0, 6)
          .as("p90"),
        (max(col("c")) / 100.0).as("max_value"))

  /** The DETERMINISTIC bounded-error quantile plan — the third leg of
    * the quantile family: [[valueQuantiles]] is exact (per-group sort,
    * wrong at 100 TB), [[valueQuantilesApprox]] is the built-in KLL-ish
    * sketch (merge-order-sensitive internals → rows-only), and THIS is
    * a fixed-width histogram: bucket every value to `stepCents`-wide
    * bins (map-only), count per (type, bin) — a partial-aggregated
    * shuffle of at most #bins rows per partition — then read the
    * rank-`ceil(q*n)` bin off the tiny cumulative relation. The answer
    * is a GUARANTEED enclosing interval [lo, hi) of width step for the
    * true type-1 quantile, and every step is exact integer arithmetic,
    * so the result is bit-deterministic and sits under the DuckDB hash
    * gate — approximation with error bounds, not approximation with
    * nondeterminism. Output: (event_type, p50_lo, p50_hi, p90_lo,
    * p90_hi) in display units.
    */
  def valueQuantilesHistogram(spark: SparkSession, dir: String,
      stepCents: Long = 500L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("b"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val cum = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(cents(col("value")) / lit(stepCents.toDouble)).as("b"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wt))
      .withColumn("r50", expr("(total + 1) DIV 2"))
      .withColumn("r90", expr("(9 * total + 9) DIV 10"))
    cum.groupBy(col("event_type"))
      .agg(min(when(col("cum") >= col("r50"), col("b"))).as("b50"),
        min(when(col("cum") >= col("r90"), col("b"))).as("b90"))
      .select(col("event_type"),
        (col("b50") * stepCents / 100.0).as("p50_lo"),
        ((col("b50") + 1) * stepCents / 100.0).as("p50_hi"),
        (col("b90") * stepCents / 100.0).as("p90_lo"),
        ((col("b90") + 1) * stepCents / 100.0).as("p90_hi"))
  }

  /** DETERMINISTIC MERGEABLE quantile sketch — the point-estimate leg
    * that closes the family under the hash gate ([[valueQuantilesApprox]]
    * stays as the built-in `percentile_approx` surface, but its sketch
    * is merge-order-sensitive by design, so it can never sit under a
    * value-hash oracle): the sketch STATE is the fixed-width histogram
    * of (bucket → count) pairs — commutative integer sums, so ANY
    * merge order over any partitioning yields the identical state —
    * and the estimate reads rank `ceil(q·n)` off the cumulative
    * relation with linear interpolation INSIDE the containing bucket:
    *
    *   est = b·step + (r − cum_before)·step / n_b
    *
    * Exact integers until one fixed-order double division per type, so
    * both engines agree bit-for-bit; estimation error is bounded by
    * the bucket width (step/100 display units). At 100 TB the state is
    * value-domain-bounded (#buckets), never corpus-sized — the sketch
    * property that matters — and the cumulative window runs over that
    * bounded relation. Output: (event_type, p50, p90, max_value).
    */
  def valueQuantilesSketch(spark: SparkSession, dir: String,
      stepCents: Long = 500L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("b"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val cum = Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("c"))
      .withColumn("b", floor(col("c") / lit(stepCents.toDouble)))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n"), max(col("c")).as("mx"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wt))
      .withColumn("r50", expr("(total + 1) DIV 2"))
      .withColumn("r90", expr("(9 * total + 9) DIV 10"))
    // exactly one bucket per type satisfies cum >= r AND cum - n < r
    // (the bucket containing rank r), so min() just extracts it
    def est(r: String) =
      min(when(col("cum") >= col(r) && col("cum") - col("n") < col(r),
        round(((col("b") * stepCents).cast("double") +
          ((col(r) - col("cum") + col("n")) * stepCents).cast("double")
            / col("n").cast("double")) / 100.0, 6)))
    cum.groupBy(col("event_type"))
      .agg(est("r50").as("p50"), est("r90").as("p90"),
        (max(col("mx")) / 100.0).as("max_value"))
  }

  /** Staged funnel analysis (view → click → purchase, in event-time
    * order): per user, the first view, the first click AFTER that view,
    * and the first purchase AFTER that click, with the funnel stage
    * reached (1–3). Timestamps emitted as epoch-µs integers (the
    * engine-portable form). Output: one row per user with ≥ 1 view.
    *
    * Scale shape: each stage is a filtered partial-agged min on
    * user_id, and every join is a user_id equi-join — co-partitioned
    * with the aggs, no windows over full event history, nothing
    * quadratic. Exactly the plan that survives a 100× user count.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("fv_us"))
    val fc = ev.filter(col("event_type") === "click").join(fv, "user_id")
      .filter(col("us") > col("fv_us"))
      .groupBy("user_id").agg(min(col("us")).as("fc_us"))
    val fp = ev.filter(col("event_type") === "purchase").join(fc, "user_id")
      .filter(col("us") > col("fc_us"))
      .groupBy("user_id").agg(min(col("us")).as("fp_us"))
    fv.join(fc, Seq("user_id"), "left").join(fp, Seq("user_id"), "left")
      .select(col("user_id"), col("fv_us"), col("fc_us"), col("fp_us"),
        (lit(1) + when(col("fc_us").isNotNull, 1).otherwise(0) +
          when(col("fp_us").isNotNull, 1).otherwise(0)).as("stage"))
  }

  /** Top-k highest-value events per type, via the bounded-heap operator
    * in its two-phase form (map-side per-group prune, then one shuffle
    * carrying only ≤ partitions × types × k survivors — `event_type` has
    * 5 distinct values, exactly the low-cardinality skew case the
    * partial pass exists for). The streaming twin maintaining the same
    * leaderboard incrementally is
    * [[graft.streaming.EventStream.streamTopKAmounts]]; both share this
    * query's oracle.
    */
  def topAmounts(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    graft.plans.GraftOps.topKPerGroup(
      Tables.events(spark, dir).select(col("event_type"), col("event_id"), col("value")),
      Seq("event_type"), Seq("value" -> false, "event_id" -> true), k,
      partialFirst = true)

  /** JSON extraction (`props` is a JSON string): per-type stats over the
    * extracted integer field `k`.
    */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        (sum(col("k")) / count(col("k"))).as("avg_k"))

  /** The mergeable partial-aggregate state behind [[incrementalAgg]]:
    * per (day, event_type) — count, cents sum, cents min/max.
    */
  private def dailyPartial(ev: DataFrame): DataFrame =
    ev.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        min(col("c")).as("mn"), max(col("c")).as("mx"))

  /** Incremental aggregate maintenance — the materialized-view refresh
    * algebra: the daily per-type aggregate is computed as two
    * INDEPENDENT partial states (an "existing" partition and a "new
    * batch", split here by event_id parity) merged state-to-state
    * (counts and sums add, min/max fold; avg derives after the merge).
    * The declared oracle is the FULL recompute — equality proves the
    * merge algebra, i.e. a new batch can refresh the view by touching
    * only its own partials, never re-reading history.
    *
    * Scale shape: each leg is a plain partial-aggregatable groupBy; the
    * merge runs over two already-aggregated relations of |days|×|types|
    * rows. At 100 TB the "old" leg is the stored view (a metadata read),
    * and the refresh cost is the new batch's size alone.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
      cents(col("value")).as("c"), col("event_id"))
    val merged = dailyPartial(ev.filter(pmod(col("event_id"), lit(2)) === 0))
      .unionByName(dailyPartial(ev.filter(pmod(col("event_id"), lit(2)) === 1)))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    merged.select(col("day"), col("event_type"), col("n"),
      (col("s") / 100.0).as("sum_value"),
      (col("mn") / 100.0).as("min_value"),
      (col("mx") / 100.0).as("max_value"),
      round(col("s").cast("double") / col("n") / 100.0, 6).as("avg_value"))
  }

  /** Trailing 7-day rolling aggregates per event type over the daily
    * rollup — the RANGE-frame window form (frame keyed by day DISTANCE,
    * not row count, so gap days shrink the frame the way a calendar
    * metric requires).
    *
    * Exactness: the frame sums BIGINT cents (exact in any order); the
    * rolling average divides two exact window sums once. Scale shape:
    * the window runs over the |types| × |days| daily rollup (already
    * aggregated — tiny), never over raw events.
    */
  def rolling7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .withColumn("epday",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("epday"))
      .rangeBetween(-6, 0)
    daily.select(col("event_type"),
      date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
      (col("s") / 100.0).as("sum_value"),
      (sum(col("s")).over(w) / 100.0).as("roll7_sum"),
      round(sum(col("s")).over(w).cast("double") / sum(col("n")).over(w)
        / 100.0, 6).as("roll7_avg_event"))
  }

  /** Supervised LAG-FEATURE table — the feature-engineering step that
    * turns the daily revenue series into a forecasting training set:
    * per (event_type, day), the target `y` (that day's exact-cents
    * revenue) beside its lag-1 and lag-7 values and the trailing
    * 7-day mean EXCLUDING the current day (else the feature leaks the
    * target). Rows whose lag-7 is missing (the first week) carry
    * NULLs — the loader's mask column, kept explicit rather than
    * silently dropped.
    *
    * All three features share CALENDAR day semantics: the lags are
    * single-point RANGE frames on `epday` (`RANGE BETWEEN n PRECEDING
    * AND n PRECEDING` — the row at exactly day−n, or NULL when that
    * day had no events), NOT row-offset `lag(n)`, which on a calendar
    * with a zero-event gap day would silently address the wrong day
    * (n ROWS back ≠ n DAYS back) while the calendar-true trailing
    * mean stayed correct beside it.
    *
    * Exactness: lags move exact cent longs; the trailing mean divides
    * two exact integer window sums once. Scale shape: one
    * partial-agged rollup to the (type, day) calendar relation, then
    * windows per type over calendar-bounded partitions — nothing
    * grows with event volume. Output: (event_type, day, y, lag1,
    * lag7, trail7_mean).
    */
  def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("s"))
      .withColumn("epday",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("epday"))
    val at1 = ord.rangeBetween(-1, -1)
    val at7 = ord.rangeBetween(-7, -7)
    val trail = ord.rangeBetween(-7, -1)
    daily.select(col("event_type"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      (col("s") / 100.0).as("y"),
      (max(col("s")).over(at1) / 100.0).as("lag1"),
      (max(col("s")).over(at7) / 100.0).as("lag7"),
      round(sum(col("s")).over(trail).cast("double")
        / count(col("s")).over(trail) / 100.0, 6).as("trail7_mean"))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    * user (event-time order, event_id tie-break) — the change-point
    * segmentation that turns a log into state intervals (sessions
    * segment by time gap; islands segment by value change).
    *
    * Scale shape: one window pass flags changes (lag), a running sum
    * numbers the islands, one groupBy collapses them — all on the same
    * user_id partitioning, so the three steps share one shuffle.
    */
  def stateIslands(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val flagged = e.withColumn("chg",
      when(lag(col("event_type"), 1).over(w).isNull ||
        lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("chg")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(first(col("event_type")).as("event_type"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("island"), col("event_type"),
        col("start_us"), col("end_us"), col("n_events"))
  }

  /** Fixed-width value histogram per event type (bucket width
    * `widthCents` cents): bucket index, inclusive lower bound, count.
    * Pure partial-aggregatable groupBy — the OLAP histogram that scales
    * to any row count because cardinality is |types| × |buckets|.
    */
  def histogram(spark: SparkSession, dir: String, widthCents: Int = 5000): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        floor(cents(col("value")).cast("double") / widthCents).cast("long")
          .as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"),
        (col("bucket") * widthCents / 100.0).as("lo_value"), col("n"))

  /** Winsorized mean per event type: values clamped to the exact
    * [p05, p95] quantiles before averaging — the robust-mean rule that
    * keeps a few corrupt extremes from dragging a quality metric.
    *
    * Exactness across engines: the mean is assembled from exact pieces —
    * the BIGINT sum of unclamped in-range cents plus clamp-count ×
    * bound products — in one fixed-association double expression, so
    * there is no cross-row floating accumulation to diverge between
    * Spark and the oracle. Bounds come from the same R-7 interpolation
    * both engines share (see [[valueQuantiles]]).
    *
    * Scale shape: one exact per-group quantile pass (|types| groups), a
    * broadcast join of the tiny bounds relation, one partial-agg pass.
    */
  def winsorizedMean(spark: SparkSession, dir: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("c"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(percentile(col("c"), lit(lo)).as("blo"),
        percentile(col("c"), lit(hi)).as("bhi"))
    ev.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") >= col("blo") && col("c") <= col("bhi"), col("c"))
          .otherwise(0L)).as("smid"),
        sum(when(col("c") < col("blo"), 1L).otherwise(0L)).as("nlo"),
        sum(when(col("c") > col("bhi"), 1L).otherwise(0L)).as("nhi"),
        first(col("blo")).as("blo"), first(col("bhi")).as("bhi"))
      .select(col("event_type"), col("n"),
        round((col("smid") + col("nlo") * col("blo") + col("nhi") * col("bhi"))
          / col("n") / 100.0, 6).as("wmean"))
  }

  /** Retention cohort analysis: users grouped by first-seen day (their
    * cohort), activity counted as distinct users per (cohort, day
    * offset) — the standard triangular retention matrix, at day
    * granularity over the fixture's 30-day span.
    *
    * Scale shape: first-seen is a partial-aggregatable min per user —
    * the cohort relation is |users|-sized (a broadcastable dimension at
    * any event volume); the offset join is a broadcast equi-join on
    * user_id; the final distinct-per-cell is one shuffle keyed
    * (cohort, offset). No window, no self-join of the fact table.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(broadcast(cohorts), "user_id")
      .select(col("cohort"), datediff(col("day"), col("cohort")).as("offset_days"),
        col("user_id"))
      .groupBy(col("cohort"), col("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("offset_days"), col("n_users"))
  }

  /** OHLC bars: open/high/low/close + count per (event_type, hour) —
    * the time-series downsampling primitive (candlesticks, telemetry
    * rollups). Open/close are the values of the FIRST/LAST event in the
    * bar under the total (ts, event_id) order, selected by
    * `min_by`/`max_by` over a struct ordering key.
    *
    * Scale shape: pure partial-aggregatable groupBy — min_by/max_by
    * partial-aggregate map-side like min/max, so the shuffle carries
    * one candidate row per (partition, type, hour), never the events.
    * No window pass, no per-bar sort. Exactness: all four prices are
    * SELECTED cent values (no arithmetic), order key is integer µs +
    * unique event_id — deterministic in both engines.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), cents(col("value")).as("c"))
      .withColumn("hour", floor(col("us").cast("double") / 3600000000.0)
        .cast("long"))
    e.groupBy(col("event_type"), col("hour"))
      .agg(
        (min_by(col("c"), struct(col("us"), col("event_id"))) / 100.0)
          .as("open"),
        (max(col("c")) / 100.0).as("high"),
        (min(col("c")) / 100.0).as("low"),
        (max_by(col("c"), struct(col("us"), col("event_id"))) / 100.0)
          .as("close"),
        count(lit(1)).as("n"))
  }

  /** Day-over-day movers: per (type, day), today's exact value sum
    * against the previous PRESENT day's (lag over the daily rollup —
    * reporting semantics, not calendar-gap semantics; [[resampleHourly]]
    * covers densified grids) with the absolute and percent change.
    * Window runs over the |types| x |days| rollup, never raw events;
    * pct is a single division of exact cent sums, rounded 6dp.
    */
  /** CUPED variance-reduced A/B readout (Deng et al. 2013, WSDM — the
    * standard production experimentation estimator): arms by user-id
    * parity, the PRE-period purchase spend per user as the covariate
    * X, the POST-period spend as the metric Y, and the pooled
    * θ = cov(X,Y)/var(X) adjustment
    * `Ŷ = ȳ_arm − θ·(x̄_arm − x̄_all)` that removes the
    * pre-existing-behavior variance an A/B readout otherwise pays for.
    * The theoretical variance-reduction factor ρ²(X,Y) ships beside
    * the means (permille), as a report-card number.
    *
    * Exactness: X/Y are integer cent sums per user (zero-filled over
    * the full user universe); all five pooled moments (n, Σx, Σy, Σxy,
    * Σx², Σy²) are exact integer sums, so θ, the adjusted means, and
    * ρ² are single fixed-order double expressions over exactly-agreed
    * integers — both engines evaluate the identical IEEE chain.
    *
    * Scale shape: one (user, period)-rollup shuffle of the purchase
    * slice, a broadcast zero-fill join against the user dimension, a
    * 1-row pooled moment fold crossJoined into the 2-row arm rollup.
    * Output: (arm, n_users, mean_x, mean_y, mean_y_adj, theta,
    * var_reduction_permille).
    */
  def cupedLift(spark: SparkSession, dir: String,
      cutoffDay: Long = 19738L): DataFrame = {
    val ev = Tables.events(spark, dir)
    val epday = floor(unix_micros(col("ts")) / lit(86400000000L))
      .cast("long")
    val sums = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), cents(col("value")).as("c"),
        (epday < cutoffDay).as("pre"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
    val perUser = ev.select(col("user_id")).distinct()
      .join(sums, Seq("user_id"), "left")
      .na.fill(0L, Seq("x", "y"))
      .select(col("user_id"), (col("user_id") % 2).as("arm"),
        col("x"), col("y"))
    val pooled = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val theta = (col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")) /
      (col("n").cast("double") * col("sxx") -
        col("sx").cast("double") * col("sx"))
    // num*num, not pow(num, 2): Math.pow is not correctly-rounded and
    // may differ from DuckDB's ^ in the last ulp; a plain double
    // multiply is the identical IEEE op in both engines
    val covNum = col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")
    val rho2 = (covNum * covNum) /
      ((col("n").cast("double") * col("sxx") -
        col("sx").cast("double") * col("sx")) *
       (col("n").cast("double") * col("syy") -
        col("sy").cast("double") * col("sy")))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("na"), sum(col("x")).as("sxa"),
        sum(col("y")).as("sya"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("na").as("n_users"),
        round(col("sxa").cast("double") / col("na") / 100.0, 6)
          .as("mean_x"),
        round(col("sya").cast("double") / col("na") / 100.0, 6)
          .as("mean_y"),
        round(col("sya").cast("double") / col("na") / 100.0 -
          theta * (col("sxa").cast("double") / col("na") / 100.0 -
            col("sx").cast("double") / col("n") / 100.0), 6)
          .as("mean_y_adj"),
        round(theta, 6).as("theta"),
        round(rho2 * 1000.0, 0).cast("long").as("var_reduction_permille"))
  }

  /** DAU / WAU / MAU engagement with DAU/MAU stickiness — the
    * top-of-dashboard product metric: per calendar day, the distinct
    * actives that day, over the trailing 7 days, and over the trailing
    * 30 days, plus stickiness = DAU·1000 div MAU. Trailing distinct
    * counts are NOT window-expressible (count distinct over a sliding
    * range); the relational form is the (user, day) DISTINCT activity
    * relation joined to the day calendar within each horizon — a
    * bounded ≤30× fan-out of the activity relation, then one
    * partial-aggregated distinct per (day, horizon). Pure integers.
    *
    * Scale shape: events collapse to |users|×|active-days| rows FIRST
    * (the only corpus-sized pass), the calendar join fans that small
    * relation out by ≤ horizon, and at 100 TB the same shape holds
    * because activity relations are orders of magnitude smaller than
    * event logs. Output: (epday, dau, wau, mau, stickiness_permille).
    */
  def dauWauMau(spark: SparkSession, dir: String): DataFrame = {
    val epday = floor(unix_micros(col("ts")) / lit(86400000000L))
      .cast("long")
    val act = Tables.events(spark, dir)
      .select(col("user_id"), epday.as("d")).distinct()
    val days = act.select(col("d").as("day")).distinct()
    val fan = act.join(days,
      col("day") >= col("d") && col("day") <= col("d") + 29L)
    val agg = fan.groupBy(col("day"))
      .agg(countDistinct(when(col("d") === col("day"),
        col("user_id"))).as("dau"),
        countDistinct(when(col("day") - col("d") <= 6L,
          col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
    agg.select(col("day").as("epday"),
      col("dau").cast("long").as("dau"),
      col("wau").cast("long").as("wau"),
      col("mau").cast("long").as("mau"),
      expr("dau * 1000 div mau").as("stickiness_permille"))
  }

  /** SAMPLE-RATIO-MISMATCH guardrail — the first validity check every
    * experimentation platform runs before reading ANY metric: under
    * the declared 50/50 user-parity assignment, the arm sizes must
    * match a binomial split, and χ² = Σ (n_arm − E)²/E against the
    * 1-dof critical value 3.841 (α = 0.05, a literal — no erf needed)
    * flags broken randomization (bot filtering, logging loss,
    * triggering bugs). A flagged SRM invalidates CUPED/DiD/mSPRT
    * downstream, which is why it ships beside them. Pure integer
    * counts, one fixed-order double; one aggregate scan.
    * Output: (n_treat, n_ctrl, chi2, srm_flag).
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .agg(sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("nc"))
    val e = (col("nt") + col("nc")).cast("double") / lit(2.0)
    val chi2 =
      (col("nt").cast("double") - e) * (col("nt").cast("double") - e) / e +
        (col("nc").cast("double") - e) * (col("nc").cast("double") - e) / e
    arms.select(col("nt").cast("long").as("n_treat"),
      col("nc").cast("long").as("n_ctrl"),
      round(chi2, 6).as("chi2"),
      when(chi2 > 3.841, 1).otherwise(0).as("srm_flag"))
  }

  /** MINIMUM DETECTABLE EFFECT of the experiment frame — the power
    * planning number beside the readouts: with the observed per-user
    * post-period spend variance and arm sizes,
    * MDE = (z_{α/2} + z_β)·SE = 2.8·√(var/n_t + var/n_c) at the
    * standard 80% power / 5% two-sided size (2.8 = 1.96 + 0.84,
    * literals), reported absolute and as permille of the control mean.
    * Exact cent/DECIMAL moments over the zero-filled user universe;
    * one fixed-order double chain. Output: one row
    * (n_treat, n_ctrl, se, mde_abs, mde_rel_permille).
    */
  def mdeEstimate(spark: SparkSession, dir: String,
      cutoffDay: Long = 19738L): DataFrame = {
    val ev = Tables.events(spark, dir)
    val epday = floor(unix_micros(col("ts")) / lit(86400000000L))
      .cast("long")
    val sums = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), cents(col("value")).as("c"),
        (epday < cutoffDay).as("pre"))
      .filter(!col("pre"))
      .groupBy(col("user_id")).agg(sum(col("c")).as("y"))
    val perUser = ev.select(col("user_id")).distinct()
      .join(sums, Seq("user_id"), "left")
      .na.fill(0L, Seq("y"))
      .select((col("user_id") % 2).as("arm"), col("y"))
    val yd = col("y").cast("decimal(38,0)")
    val m = perUser.agg(count(lit(1)).as("n"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
      sum(col("y")).as("sy"), sum(yd * col("y")).as("syy"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("syc"))
    val nD = col("n").cast("double")
    val varY = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy") / nD) / nD
    val se = sqrt(varY / col("nt").cast("double") +
      varY / col("nc").cast("double")) / lit(100.0)
    val meanC = col("syc").cast("double") / col("nc") / lit(100.0)
    val mde = lit(2.8) * se
    m.select(col("nt").cast("long").as("n_treat"),
      col("nc").cast("long").as("n_ctrl"),
      round(se, 6).as("se"), round(mde, 6).as("mde_abs"),
      round(mde * lit(1000.0) / meanC, 0).cast("long")
        .as("mde_rel_permille"))
  }

  /** DIFFERENCE-IN-DIFFERENCES over the same experiment frame as
    * [[cupedLift]] — the quasi-experimental estimator (Card & Krueger
    * 1994 canon): per-user spend delta d = post − pre, DiD =
    * mean_T(d) − mean_C(d), which nets out both the time trend
    * (hitting both arms) and the static arm difference (present in
    * both periods). SE via the two-sample variance of the per-user
    * deltas (population variances, the CUPED discipline) with a ±1.96
    * interval; exact cent/DECIMAL moments, one fixed-order double
    * chain per output.
    *
    * Scale shape: the same one-rollup + zero-fill join as CUPED, a
    * 2-row arm fold. Output: one row (n_treat, n_ctrl, did, se,
    * lo95, hi95).
    */
  def didLift(spark: SparkSession, dir: String,
      cutoffDay: Long = 19738L): DataFrame = {
    val ev = Tables.events(spark, dir)
    val epday = floor(unix_micros(col("ts")) / lit(86400000000L))
      .cast("long")
    val sums = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), cents(col("value")).as("c"),
        (epday < cutoffDay).as("pre"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
    val perUser = ev.select(col("user_id")).distinct()
      .join(sums, Seq("user_id"), "left")
      .na.fill(0L, Seq("x", "y"))
      .select((col("user_id") % 2).as("arm"), (col("y") - col("x")).as("d"))
    val dd = col("d").cast("decimal(38,0)")
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"),
        sum(dd * col("d")).as("sdd"))
      .select(col("arm"), col("n"), col("sd"), col("sdd"))
    val t = arms.filter(col("arm") === 1)
      .select(col("n").as("nt"), col("sd").as("sdt"), col("sdd").as("sddt"))
    val c = arms.filter(col("arm") === 0)
      .select(col("n").as("nc"), col("sd").as("sdc"), col("sdd").as("sddc"))
    val mt = col("sdt").cast("double") / col("nt")
    val mc = col("sdc").cast("double") / col("nc")
    val vt = (col("sddt").cast("double") -
      col("sdt").cast("double") * col("sdt").cast("double") / col("nt")) /
      col("nt")
    val vc = (col("sddc").cast("double") -
      col("sdc").cast("double") * col("sdc").cast("double") / col("nc")) /
      col("nc")
    val did = (mt - mc) / lit(100.0)
    val se = sqrt(vt / col("nt").cast("double") +
      vc / col("nc").cast("double")) / lit(100.0)
    t.crossJoin(broadcast(c))
      .select(col("nt").cast("long").as("n_treat"),
        col("nc").cast("long").as("n_ctrl"),
        round(did, 6).as("did"), round(se, 6).as("se"),
        round(did - lit(1.96) * se, 6).as("lo95"),
        round(did + lit(1.96) * se, 6).as("hi95"))
  }

  /** mSPRT ALWAYS-VALID experiment monitor (Johari, Pekelis & Walsh
    * 2017 — the "peeking problem" fix every experimentation platform
    * ships): per experiment day, the RUNNING two-sample effect on
    * purchase value (arms by user parity), the normal-mixture
    * sequential likelihood ratio
    *
    *   Λ_t = √(V/(V+τ²)) · exp(δ²·τ² / (2·V·(V+τ²))),
    *
    * and the always-valid p-value p_t = running min of min(1, 1/Λ) —
    * monotone by construction, so the experimenter can look EVERY day
    * without inflating false positives (a fixed-horizon t-test cannot
    * be read mid-flight).
    *
    * Exactness: per-day arm aggregates are exact cent / DECIMAL(38,0)
    * sums; cumulative sums run over the ≤|days| calendar-bounded day
    * relation (the kaplan–meier window discipline); δ, V, Λ, p are one
    * fixed-order double chain rounded 6 (`exp`/`sqrt` are single IEEE
    * calls in both engines, the established ln/sqrt tolerance).
    * Output: (epday, n_treat, n_ctrl, effect, lam, p_always_valid).
    */
  def msprtMonitor(spark: SparkSession, dir: String,
      tau2: Double = 100.0): DataFrame =
    msprtChain(msprtDaily(Tables.events(spark, dir)), tau2)

  /** The per-day arm rollup feeding [[msprtChain]] — exact cent /
    * DECIMAL(38,0) sums per (day, arm), a plain partial-aggregatable
    * groupBy with NO ordering or window, which is what makes it
    * STREAMABLE: the streamed twin maintains exactly this relation as
    * complete-mode aggregation state (|days| rows), and the Λ chain
    * runs batch-side on either source.
    */
  private[graft] def msprtDaily(events: DataFrame): DataFrame = {
    val epday = floor(unix_micros(col("ts")) / lit(86400000000L))
      .cast("long")
    events
      .filter(col("event_type") === "purchase")
      .select(epday.as("epday"), (col("user_id") % 2 === 1).as("treat"),
        cents(col("value")).as("c"))
      .groupBy(col("epday"))
      .agg(
        sum(when(col("treat"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("treat"), col("c")).otherwise(0L)).as("st"),
        sum(when(col("treat"),
          col("c").cast("decimal(38,0)") * col("c")).otherwise(
            lit(0).cast("decimal(38,0)"))).as("qt"),
        sum(when(!col("treat"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("treat"), col("c")).otherwise(0L)).as("sc"),
        sum(when(!col("treat"),
          col("c").cast("decimal(38,0)") * col("c")).otherwise(
            lit(0).cast("decimal(38,0)"))).as("qc"))
  }

  /** The cumulative mixture-likelihood chain over the (≤|days|) daily
    * rollup: running moments, effect, Λ, and the monotone always-valid
    * p. Calendar-bounded input, so the windows are trivial at any
    * event volume.
    */
  private[graft] def msprtChain(daily: DataFrame,
      tau2: Double): DataFrame = {
    val w = Window.orderBy(col("epday"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("epday"),
      sum(col("nt")).over(w).as("cnt"), sum(col("st")).over(w).as("cst"),
      sum(col("qt")).over(w).as("cqt"),
      sum(col("nc")).over(w).as("cnc"), sum(col("sc")).over(w).as("csc"),
      sum(col("qc")).over(w).as("cqc"))
      .filter(col("cnt") > 1 && col("cnc") > 1)
    val mt = col("cst").cast("double") / col("cnt") / 100.0
    val mc = col("csc").cast("double") / col("cnc") / 100.0
    val vt = (col("cqt").cast("double") / 10000.0 -
      (col("cst").cast("double") / 100.0) *
      (col("cst").cast("double") / 100.0) / col("cnt")) / col("cnt")
    val vc = (col("cqc").cast("double") / 10000.0 -
      (col("csc").cast("double") / 100.0) *
      (col("csc").cast("double") / 100.0) / col("cnc")) / col("cnc")
    val eff = mt - mc
    val v = vt / col("cnt").cast("double") + vc / col("cnc").cast("double")
    val lam = sqrt(v / (v + tau2)) *
      exp(eff * eff * tau2 / (lit(2.0) * v * (v + tau2)))
    val p = least(lit(1.0), lit(1.0) / lam)
    cum.select(col("epday"), col("cnt").cast("long").as("n_treat"),
        col("cnc").cast("long").as("n_ctrl"),
        round(eff, 6).as("effect"), round(lam, 6).as("lam"),
        round(min(p).over(w), 6).as("p_always_valid"))
  }

  def dayOverDayMovers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("prev_s", lag(col("s"), 1).over(w))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        (col("s") / 100.0).as("sum_value"),
        (col("prev_s") / 100.0).as("prev_sum_value"),
        ((col("s") - col("prev_s")) / 100.0).as("delta"),
        round((col("s") - col("prev_s")).cast("double") / col("prev_s")
          * 100.0, 6).as("pct_change"))
  }

  /** Hour-of-day seasonality profile per event type: count and exact
    * average value by (type, hour 0-23) — the diurnal-pattern rollup
    * behind anomaly baselines and traffic forecasts. Pure
    * partial-aggregatable groupBy; cardinality |types| x 24 at any
    * event volume.
    */
  def hourlySeasonality(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).as("hod"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("c")).cast("double") / count(lit(1)) / 100.0, 6)
          .as("avg_value"))

  /** Seasonal-naive forecast + backtest: predict the LAST day's hourly
    * average per type from the same-hour average of all PRIOR days,
    * and report the absolute error — the baseline every forecasting
    * pipeline must beat, with its evaluation in the same plan.
    *
    * Exactness: both averages derive from exact BIGINT cent sums and
    * round once; the error is a single subtraction of the two rounded
    * doubles. Scale shape: two partial-aggregatable rollups over
    * (type, hod) joined on that key; the 1-row max-day relation
    * attaches by broadcast.
    */
  def seasonalNaiveForecast(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).as("hod"), cents(col("value")).as("c"))
    val mx = e.agg(max(col("day")).as("dmax"))
    val withMax = e.crossJoin(broadcast(mx))
    // hist + actual as ONE conditional-aggregation pass: the former
    // two filtered rollups joined on (type, hod) scanned events twice
    // and shuffled twice (guide §2.4 — share the exchange); the inner
    // join's "key present on both sides" becomes n > 0 AND na > 0
    val both = withMax
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(when(col("day") < col("dmax"), col("c"))).as("s"),
        count(when(col("day") < col("dmax"), lit(1))).as("n"),
        sum(when(col("day") === col("dmax"), col("c"))).as("sa"),
        count(when(col("day") === col("dmax"), lit(1))).as("na"))
      .filter(col("n") > 0 && col("na") > 0)
    val fc = round(col("s").cast("double") / col("n") / 100.0, 6)
    val ac = round(col("sa").cast("double") / col("na") / 100.0, 6)
    both.select(col("event_type"), col("hod"), ac.as("actual_avg"),
      fc.as("forecast_avg"), round(abs(ac - fc), 6).as("abs_err"))
  }

  /** Cumulative distinct users per (type, day) — the
    * distinct-count-over-window idiom, translated to the form that
    * scales: SQL window engines (and Spark not at all) handle
    * `COUNT(DISTINCT) OVER` poorly because every frame re-deduplicates;
    * the first-occurrence-flag construction computes each user's first
    * active day once (one row_number pass over the deduplicated
    * (type, user, day) relation), daily new-user counts partial-
    * aggregate, and the running sum runs over the |types| x |days|
    * rollup. Same algorithm on both engines -> exact equality.
    */
  def cumulativeDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val tud = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("day"))
    val daily = tud
      .withColumn("is_first",
        when(row_number().over(firstDay) === 1, 1L).otherwise(0L))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("is_first")).as("new_users"),
        count(lit(1)).as("active_users"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily.select(col("event_type"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("new_users"), col("active_users"),
      sum(col("new_users")).over(cum).as("cum_distinct_users"))
  }

  /** Slowly-changing-dimension Type 2 build: [[stateIslands]] recast as
    * the warehouse pattern — per user, each run of consecutive
    * same-type events becomes a versioned dimension row with
    * `valid_from_us` / `valid_to_us` (exclusive, next version's start;
    * null while current) and an `is_current` flag. The interval
    * columns derive from one `lead()` over the already-collapsed
    * island relation — |islands| rows, never raw events.
    */
  def scd2UserStates(spark: SparkSession, dir: String): DataFrame = {
    val islands = stateIslands(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("island"))
    islands
      .withColumn("valid_to_us", lead(col("start_us"), 1).over(w))
      .select(col("user_id"), col("island").as("version"),
        col("event_type").as("state"), col("start_us").as("valid_from_us"),
        col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"),
        col("n_events"))
  }

  /** Change-data-capture snapshot diff: two versions of the per-user
    * daily aggregate (events split by day parity as the "old" and
    * "new" snapshot stand-ins) full-outer-joined on the key, each row
    * classified insert / delete / update / unchanged — the diff every
    * incremental downstream consumer applies.
    *
    * Scale shape: both snapshots are partial-aggregatable groupBys on
    * the same key; the diff is one co-partitioned full outer join on
    * that key; the classification is a map-only CASE. At 100 TB both
    * sides would be stored aggregates (metadata reads), and the join
    * shuffles |keys|, not events.
    */
  def cdcSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      col("event_type"), cents(col("value")).as("c"),
      dayofmonth(col("ts")).as("dom"))
    def snap(filter: org.apache.spark.sql.Column): DataFrame = ev.filter(filter)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val old = snap(pmod(col("dom"), lit(2)) === 0)
      .withColumnRenamed("n", "n_old").withColumnRenamed("s", "s_old")
    val nw = snap(pmod(col("dom"), lit(2)) === 1)
      .withColumnRenamed("n", "n_new").withColumnRenamed("s", "s_new")
    old.join(nw, Seq("user_id", "event_type"), "full_outer")
      .select(col("user_id"), col("event_type"),
        col("n_old"), (col("s_old") / 100.0).as("sum_old"),
        col("n_new"), (col("s_new") / 100.0).as("sum_new"),
        when(col("n_old").isNull, "insert")
          .when(col("n_new").isNull, "delete")
          .when(col("n_old") =!= col("n_new") ||
            col("s_old") =!= col("s_new"), "update")
          .otherwise("unchanged").as("change"))
  }

  /** Time-series resampling: the per-(type, hour) rollup densified to a
    * gapless hourly grid (sequence + explode between each type's min
    * and max hour), with missing hours carrying n=0 and a
    * forward-filled value sum (`last(_, ignoreNulls)` over the hour
    * order) — the resample/ffill primitive every downstream
    * feature-window computation assumes.
    *
    * Scale shape: the grid is |types| x |hours| (calendar-bounded, not
    * row-bounded); the densify join is a broadcastable equi-join of
    * the grid against the ALREADY-AGGREGATED rollup; the fill window
    * orders hours within a type — cardinality |grid|, never raw events.
    */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")).cast("double") / 3600000000.0)
          .cast("long").as("hour"),
        cents(col("value")).as("c"))
    val h = e.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val grid = h.groupBy(col("event_type"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    grid.join(h, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        (col("s") / 100.0).as("sum_value"),
        (last(col("s"), ignoreNulls = true).over(w) / 100.0).as("ffill_sum"))
  }

  /** Equi-depth (equal-frequency) histogram: `buckets` ntile buckets
    * per event type over the exact cent values, with per-bucket count
    * and value bounds — the quantile-bucketing that feeds monotone
    * feature binning.
    *
    * Scale note: exact ntile is a full per-type sort — correct at
    * fixture scale and the exact twin of the mergeable-sketch path; at
    * 100 TB bucket by [[valueQuantilesApprox]] boundaries instead
    * (broadcast the sketch bounds, map-side bucket assignment), same
    * output schema.
    */
  def equidepthHistogram(spark: SparkSession, dir: String,
      buckets: Int = 10): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
    e.withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), (min(col("c")) / 100.0).as("lo"),
        (max(col("c")) / 100.0).as("hi"))
  }

  /** Per-user exponential moving average of event values (event-time
    * order, `ewma = acc + alpha * (x - acc)`) — the time-decayed state
    * every online feature store maintains.
    *
    * Determinism across engines: the per-user sequence materializes as
    * a SORTED array (sort_array over (us, event_id, c) structs — a
    * total order), and the fold is a fixed-association expression
    * using ONLY alpha (the `acc + a*(x-acc)` form; an `a*x + (1-a)*acc`
    * form would need the complementary weight 1-a, whose rounding can
    * fall on a representability tie). Same IEEE op order in both
    * engines -> bit-identical doubles.
    *
    * Scale shape: one shuffle on user_id; per-entity history is
    * bounded (an entity's event count, not the corpus); the streaming
    * twin is mapGroupsWithState carrying one double per user.
    */
  def ewma(spark: SparkSession, dir: String, alpha: Double = 0.3): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), cents(col("value")).as("c"))
    val l = e.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"),
        col("c")))).as("evs"), count(lit(1)).as("n"))
      .withColumn("xs", transform(col("evs"), s =>
        s.getField("c").cast("double")))
    l.select(col("user_id"), col("n"),
      round(aggregate(
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        element_at(col("xs"), 1),
        (acc, x) => acc + lit(alpha) * (x - acc)) / 100.0, 6).as("ewma"))
  }

  /** Statistical outlier detection: events whose value is more than
    * `sigmas` sample standard deviations from their type's mean — the
    * data-quality screen that catches corrupt measurements before they
    * poison a training corpus.
    *
    * Exactness across engines: mean and variance derive from EXACT
    * BIGINT sums (n, Σc, Σc²) — no float accumulation — and the z-score
    * is one fixed-association double expression over those exact
    * inputs, so Spark and the oracle compute bit-identical doubles.
    * The comparison is on z directly (not a rounded copy), with the
    * same expression on both sides.
    *
    * Scale shape: one partial-agg pass for the moment sums (|types|
    * rows), a broadcast join of that tiny stats relation, one map-only
    * filter. Σc² of cents overflows BIGINT only past ~4e5 rows × (3e6)²
    * ≈ 9e18 — beyond that the sums widen to DECIMAL(38,0), same plan.
    */
  def anomalyZscore(spark: SparkSession, dir: String,
      sigmas: Double = 2.5): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    // sample std-dev from exact sums: var = (n*Σc² - (Σc)²) / (n*(n-1))
    val sd = sqrt((col("ss").cast("double") * col("n")
      - col("s").cast("double") * col("s"))
      / (col("n").cast("double") * (col("n") - 1)))
    // z from exact pieces: (c*n - s) / (n * sd)
    val z = ((col("c").cast("double") * col("n") - col("s"))
      / (col("n").cast("double") * sd))
    e.join(broadcast(stats), "event_type")
      .filter(abs(z) > sigmas)
      .select(col("event_type"), col("event_id"), (col("c") / 100.0).as("value"),
        round(z, 6).as("z"))
  }

  /** MAD-based robust anomaly detection — the outlier-resistant twin
    * of [[anomalyZscore]]: modified z-score
    * Mz = 0.6745·(x − median) / MAD (Iglewicz–Hoaglin), flagged at
    * |Mz| > 3.5. Mean/std inflate under the very outliers being
    * hunted (masking); median/MAD have a 50% breakdown point, so this
    * is the detector monitoring pipelines actually deploy on heavy
    * tails.
    *
    * Exactness across engines: medians use the ×2 exact-interpolation
    * trick on integer cents (med2 = 2·median and mad4 = 4·MAD are
    * exact longs), so Mz is computed from integer pieces in one fixed
    * expression order. Types with MAD = 0 (a majority-constant
    * series) are excluded by guard rather than dividing by zero.
    *
    * Scale shape: two per-type exact-percentile aggregates (at 100 TB
    * these swap for the bounded-error histogram quantiles — the flag
    * join is unchanged) + broadcast stat joins; the event scan never
    * shuffles. Output: (event_type, event_id, value, mz rounded 6).
    */
  def anomalyMad(spark: SparkSession, dir: String,
      threshold: Double = 3.5): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
    val med = e.groupBy(col("event_type"))
      .agg(round(percentile(col("c"), lit(0.5)) * 2, 0).cast("long")
        .as("med2"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("event_id"), col("c"), col("med2"),
        abs(col("c") * 2 - col("med2")).as("d2"))
    val mad = dev.groupBy(col("event_type"))
      .agg(round(percentile(col("d2"), lit(0.5)) * 2, 0).cast("long")
        .as("mad4"))
    val mz = lit(0.6745) * (col("c").cast("double") * 2 - col("med2")) * 2 /
      col("mad4")
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad4") > 0 && abs(mz) > threshold)
      .select(col("event_type"), col("event_id"),
        (col("c") / 100.0).as("value"), round(mz, 6).as("mz"))
  }

  /** CUSUM changepoint detection per event type over the daily revenue
    * series: the day T maximizing |S_T|, where
    * S_T = Σ_{t≤T} (x_t − x̄) is the cumulative deviation from the
    * series mean — the classic offline changepoint statistic (a level
    * shift makes |S| peak at the shift). Reported per type with the
    * normalized peak deviation.
    *
    * Exactness across engines: multiplying through by n_days clears
    * the rational mean — S'_T = n·Σ_{t≤T} x_t − T·Σx is INTEGER cents
    * arithmetic end to end, so the argmax and the hash-checked score
    * are deterministic in any accumulation order (the same trick as
    * ExactNum money sums). |S'| fits a long comfortably at any fixture
    * scale (≤ days × total-cents).
    *
    * Scale shape: the windows run over the (type, day) ROLLUP — one
    * partial-aggregated shuffle reduces raw events first; the
    * per-type series is days-sized however many events exist.
    * Output: (event_type, change_day, peak_dev rounded 6).
    */
  /** Lag-k autocorrelation (ACF, lags 1..`maxLag`) of each type's
    * daily revenue series — the diagnostic that says WHICH lag
    * matters before fitting any forecaster ([[holtForecast]],
    * [[seasonality]]): ACF(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)².
    *
    * Exactness: multiplying through by n clears the rational mean —
    * d_t = n·x_t − Σx is an exact integer, so numerator and
    * denominator are exact integer sums (DECIMAL(38,0) — d_t² can
    * pass 2^63 at bench scale) in any accumulation order, divided
    * once. Lags index CONSECUTIVE observations (row number), so
    * calendar gaps don't silently misalign pairs.
    *
    * Scale shape: the series is the days-sized rollup; the lag pairs
    * come from one self-equi-join on (type, i+k) over that tiny
    * relation — events are scanned once. Output:
    * (event_type, lag, n_days, acf rounded 6).
    */
  def autocorrelation(spark: SparkSession, dir: String,
      maxLag: Int = 7): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val w = Window.partitionBy(col("event_type"))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val idx = daily
      .withColumn("i", row_number().over(w.orderBy(col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("dc")).over(w))
      .select(col("event_type"), col("i"), col("n"),
        (col("n") * col("dc") - col("s")).cast(dec).as("d"))
    val den = idx.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"), max(col("n")).as("n_days"))
    val a = idx.select(col("event_type"), col("i"), col("d").as("da"),
      explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
    val b = idx.select(col("event_type"), col("i").as("ib"),
      col("d").as("db"))
    a.join(b, a("event_type") === b("event_type") &&
        col("ib") === col("i") + col("lag"))
      .groupBy(a("event_type"), col("lag"))
      .agg(sum(col("da") * col("db")).as("num"))
      .join(den, "event_type")
      .select(col("event_type"), col("lag"), col("n_days"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
  }

  /** Holt double-exponential (level + trend) smoothing per event type
    * over the daily revenue series, with an h-step-ahead forecast —
    * the trend-aware step up from [[ewma]]'s single smoothing and the
    * [[forecastNaive]] baseline. Standard init (l₁ = x₁, t₁ = x₂−x₁);
    * per step l' = α·x + (1−α)(l+t), t' = β(l'−l) + (1−β)t; forecast
    * = l_n + h·t_n.
    *
    * Determinism: the recursion is order-sensitive BY DEFINITION, so
    * it runs as one sorted left fold over each type's day-ordered
    * series with a two-field struct accumulator — the exact [[ewma]]
    * discipline; the oracle replays the identical fold via
    * `list_reduce` over the identically-ordered list. α = β = 0.5
    * (binary-exact halving keeps every step's arithmetic identical
    * across engines; any α works — the EWMA rows pin 0.3).
    *
    * Scale shape: the fold runs over the DAYS-sized rollup (one
    * partial-aggregated shuffle collapses raw events first), so state
    * per type is two doubles and the list is |days| long regardless
    * of event count. Output:
    * (event_type, n_days, level, trend, forecast_h3) rounded 6.
    */
  def holtForecast(spark: SparkSession, dir: String, alpha: Double = 0.5,
      beta: Double = 0.5, h: Int = 3): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("dc")))).as("evs"),
        count(lit(1)).as("n_days"))
      .withColumn("xs", transform(col("evs"),
        s => s.getField("dc").cast("double") / 100.0))
      .filter(size(col("xs")) >= 2)
    val init = struct(
      element_at(col("xs"), 1).as("l"),
      (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("t"))
    val folded = series.select(col("event_type"), col("n_days"),
      aggregate(
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        init,
        (acc, x) => {
          val l2 = lit(alpha) * x +
            lit(1.0 - alpha) * (acc.getField("l") + acc.getField("t"))
          struct(l2.as("l"),
            (lit(beta) * (l2 - acc.getField("l")) +
              lit(1.0 - beta) * acc.getField("t")).as("t"))
        }).as("st"))
    folded.select(col("event_type"), col("n_days"),
      round(col("st").getField("l"), 6).as("level"),
      round(col("st").getField("t"), 6).as("trend"),
      round(col("st").getField("l") + lit(h.toDouble) * col("st").getField("t"), 6)
        .as("forecast_h3"))
  }

  /** Holt-Winters additive triple smoothing (level + trend + weekly
    * seasonality, m = 7) per event type over the daily revenue series —
    * the seasonal step up from [[holtForecast]], completing the
    * forecasting ladder (naive → EWMA → Holt → Holt-Winters). NIST
    * init from the first two periods: l = mean(x₁..x₇),
    * b = Σ(x₇₊ᵢ − xᵢ)/49, sᵢ = xᵢ − l; per step from t = m+1:
    * l' = α(x − s_{t−m}) + (1−α)(l+b); b' = β(l'−l) + (1−β)b;
    * s_t = γ(x − l') + (1−γ)s_{t−m}. Forecast = l + h·b + s_{n+h−m}.
    *
    * Determinism: the init sums run over exact cent longs (one integer
    * slice-sum each), the recursion is a single sorted fold whose
    * accumulator carries (l, b, seasonal ring of m doubles) — the
    * oracle replays the identical recursion as a recursive CTE
    * threading the ring as a LIST column, every double op in the same
    * written order, α = β = γ = 0.5. Types with fewer than 2m days are
    * excluded (init needs two full periods).
    *
    * Scale shape: the fold runs over the DAYS-sized rollup (the
    * [[ewma]]/[[holtForecast]] discipline) — state per type is m+2
    * doubles no matter how many raw events. Output: (event_type,
    * n_days, level, trend, forecast_h3) rounded 6.
    */
  def holtWintersForecast(spark: SparkSession, dir: String, m: Int = 7,
      h: Int = 3): DataFrame = {
    require(h >= 1 && h <= m, "forecast horizon within one period")
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("dc")))).as("evs"),
        count(lit(1)).as("n_days"))
      .filter(size(col("evs")) >= 2 * m)
      .withColumn("cs", transform(col("evs"), s => s.getField("dc")))
    // exact integer init sums over the first two periods
    val sc1 = aggregate(slice(col("cs"), 1, m), lit(0L), (a, x) => a + x)
    val sc2 = aggregate(slice(col("cs"), m + 1, m), lit(0L), (a, x) => a + x)
    val lm = sc1.cast("double") / 100.0 / m.toDouble
    val bm = (sc2 - sc1).cast("double") / 100.0 / (m * m).toDouble
    val s0 = transform(slice(col("cs"), 1, m),
      c => c.cast("double") / 100.0 - lm)
    val prepped = series
      .withColumn("xs", transform(
        slice(col("cs"), lit(m + 1), greatest(size(col("cs")) - m, lit(0))),
        c => c.cast("double") / 100.0))
      .withColumn("init", struct(lm.as("l"), bm.as("b"), s0.as("s")))
    val folded = prepped.select(col("event_type"), col("n_days"),
      aggregate(col("xs"), col("init"), (acc, x) => {
        val s1 = element_at(acc.getField("s"), 1)
        val l2 = lit(0.5) * (x - s1) +
          lit(0.5) * (acc.getField("l") + acc.getField("b"))
        val b2 = lit(0.5) * (l2 - acc.getField("l")) +
          lit(0.5) * acc.getField("b")
        val sn = lit(0.5) * (x - l2) + lit(0.5) * s1
        struct(l2.as("l"), b2.as("b"),
          concat(slice(acc.getField("s"), 2, m - 1), array(sn)).as("s"))
      }).as("st"))
    folded.select(col("event_type"), col("n_days"),
      round(col("st").getField("l"), 6).as("level"),
      round(col("st").getField("b"), 6).as("trend"),
      round(col("st").getField("l") +
        lit(h.toDouble) * col("st").getField("b") +
        element_at(col("st").getField("s"), h), 6).as(s"forecast_h$h"))
  }

  /** Classical additive seasonal decomposition (period 7) of the daily
    * revenue series per type — the weekly-shape profile next to
    * [[seasonality]]'s raw weekday means and [[holtWintersForecast]]'s
    * adaptive ring: detrend with a centered 7-row moving average (full
    * windows only), then average the detrended values per cyclical
    * weekday slot. A slot's index is how far above/below trend that
    * weekday sits — the profile a capacity planner reads.
    *
    * Determinism: the MA stays an integer cent sum; each day's
    * detrended value quantizes to micro-dollars (one fixed-shape
    * double expression) BEFORE the per-slot mean — order-free exact
    * sums, one division per output row. Consecutive-ROW windows (the
    * autocorrelation discipline: calendar gaps don't misalign frames,
    * they just widen the MA's span).
    *
    * Scale shape: windows + rollup over the DAYS-sized daily relation.
    * Output: (event_type, weekday, n_days, seasonal rounded 6).
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("t7", sum(col("dc")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === 7)
      .withColumn("det6",
        round((col("dc").cast("double") / 100.0 -
          col("t7").cast("double") / 700.0) * 1e6, 0).cast("long"))
      .groupBy(col("event_type"), (col("day") % 7).as("weekday"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("det6")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("seasonal"))
  }

  /** Kaplan-Meier survival curve over user LIFETIMES (days between a
    * user's first and last event): S(t) = Π_{s≤t} (1 − d_s/n_s) with
    * d_s churns at lifetime s and n_s users still at risk — the
    * retention curve's principled form (the fixture window observes
    * every lifetime, so nothing is censored; with censoring, censored
    * users would leave the risk set without a death factor — same
    * plan).
    *
    * Determinism: per-step factors (n−d)/n are single fixed divisions;
    * the survival products fold the factor ARRAY in ascending lifetime
    * order in BOTH engines (prefix-slice folds — k ≤ days steps, so
    * the O(k²) prefix expansion is free), matching bit for bit.
    *
    * Scale shape: one per-user rollup (first/last day), one
    * lifetime-histogram rollup, one cumulative window for the risk
    * sets, one tiny array fold. Output: (lifetime_days, n_risk,
    * n_churn, survival rounded 6), ascending.
    */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg((max(col("day")) - min(col("day"))).as("lt"))
    val hist = life.groupBy(col("lt")).agg(count(lit(1)).as("d"))
    val wTail = Window.orderBy(col("lt"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val steps = hist
      .withColumn("n", sum(col("d")).over(wTail))
      .withColumn("f",
        (col("n") - col("d")).cast("double") / col("n").cast("double"))
    val packed = steps.select(col("lt"), col("d"), col("n"), col("f"))
      .agg(sort_array(collect_list(
        struct(col("lt"), col("d"), col("n"), col("f")))).as("xs"))
    packed.select(posexplode(col("xs")).as(Seq("i", "s")))
      .crossJoin(packed)
      .select(
        col("s").getField("lt").as("lifetime_days"),
        col("s").getField("n").as("n_risk"),
        col("s").getField("d").as("n_churn"),
        round(aggregate(
          transform(slice(col("xs"), lit(1), col("i") + 1),
            x => x.getField("f")),
          lit(1.0), (acc, f) => acc * f), 6).as("survival"))
  }

  /** Nelson-Aalen cumulative hazard over the same lifetime histogram
    * as [[kaplanMeier]]: H(t) = Σ_{s≤t} d_s/n_s — the estimator of
    * choice when hazards are the object (KM's product form compounds
    * the same increments; at small per-step hazard S ≈ e^−H). Unlike
    * the product, the SUM quantizes exactly: each step's hazard
    * d/n rounds to integer micro-units BEFORE the prefix sum, so the
    * cumulative is an order-free integer until one final division.
    * Output: (lifetime_days, n_risk, n_churn, cum_hazard rounded 6).
    */
  def nelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg((max(col("day")) - min(col("day"))).as("lt"))
    val hist = life.groupBy(col("lt")).agg(count(lit(1)).as("d"))
    val wTail = Window.orderBy(col("lt"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("lt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n", sum(col("d")).over(wTail))
      .withColumn("h6", round(col("d").cast("double") /
        col("n").cast("double") * 1e6, 0).cast("long"))
      .withColumn("cum6", sum(col("h6")).over(wCum))
      .select(col("lt").as("lifetime_days"), col("n").as("n_risk"),
        col("d").as("n_churn"),
        round(col("cum6") / 1e6, 6).as("cum_hazard"))
  }

  /** Marketing-style revenue attribution: every `purchase` conversion
    * credits its user's FIRST and LAST preceding touch (`click`/`view`)
    * — the two classic single-touch models, reported side by side per
    * channel (plus `none` for touchless conversions). "Preceding" is
    * strict (ts, event_id) row order, so simultaneous events resolve
    * deterministically.
    *
    * Plan: ONE window pass over the user-partitioned event stream
    * computes both models (first/last ignore-null over the unbounded-
    * preceding frame) — no self-join of touches × conversions; then one
    * rollup per model, unioned. Exact cent arithmetic.
    *
    * Scale shape: the window partitions by user_id (hash-distributed,
    * no global order); state per row is two running values. At 100 TB
    * this is the same one-shuffle sessionization shape as
    * [[sessionize]]. Output: (model, channel, n_conversions,
    * revenue_cents).
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), cents(col("value")).as("c"))
      .withColumn("touch",
        when(col("event_type").isin("click", "view"), col("event_type")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val conv = e
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    def roll(model: String, touch: Column): DataFrame =
      conv.groupBy(coalesce(touch, lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("c")).as("revenue_cents"))
        .select(lit(model).as("model"), col("channel"),
          col("n_conversions"), col("revenue_cents"))
    roll("first_touch", col("first_touch"))
      .unionAll(roll("last_touch", col("last_touch")))
  }

  /** 7-row rolling MEDIAN of the daily revenue per type — the robust
    * sibling of the rolling mean (`events_rolling_7d`): one wild day
    * moves a centered mean by a seventh of its excursion but leaves
    * the median untouched. Exact via the ×2 interpolation trick over
    * integer cent sums inside a ROWS window (full windows only, the
    * [[seasonalDecompose]] frame discipline).
    * Output: (event_type, day, daily_cents, med2) — med2 is twice the
    * rolling median in cents, an exact integer for any window parity.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("daily_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("med2", round(
        percentile(col("daily_cents"), lit(0.5)).over(w) * 2, 0)
        .cast("long"))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === 7)
      .select(col("event_type"), col("day"), col("daily_cents"),
        col("med2"))
  }

  /** Rolling-origin one-step backtest of the forecasting ladder: for
    * each of the LAST 7 days of every type's daily series, forecast it
    * from the prefix under three models — naive (yesterday), EWMA
    * (α = 0.5), Holt level+trend (α = β = 0.5) — and report each
    * model's MAE. The model-SELECTION layer over the forecast family:
    * the number that says which model to trust is an out-of-sample
    * error, not a fit.
    *
    * Determinism: ONE sorted fold per type threads all three model
    * states (l, t, e, prev) plus three micro-quantized error sums —
    * each |actual − forecast| quantizes to an integer BEFORE its sum,
    * so accumulation is order-free; the oracle replays the identical
    * recursion as a recursive CTE carrying the same four state fields.
    *
    * Scale shape: the [[holtForecast]] discipline — fold over the
    * DAYS-sized rollup, state is seven numbers per type. Output:
    * (event_type, model, n_evals, mae rounded 6), 3 rows per type.
    */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("dc")))).as("evs"),
        count(lit(1)).as("n_days"))
      .filter(size(col("evs")) >= 14)
      .withColumn("xs", transform(col("evs"),
        s => s.getField("dc").cast("double") / 100.0))
    val n = col("n_days")
    // (x_j, j) for j = 2..n; the fold forecasts x_j from state after
    // x_{j-1}, scores it when j lands in the last 7 days, then updates
    val seq2 = transform(
      sequence(lit(2), size(col("xs"))),
      j => struct(element_at(col("xs"), j).as("x"), j.as("j")))
    val err6 = (x: org.apache.spark.sql.Column,
        f: org.apache.spark.sql.Column) =>
      round(abs(x - f) * 1e6, 0).cast("long")
    val init = struct(
      element_at(col("xs"), 1).as("l"),
      (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("t"),
      element_at(col("xs"), 1).as("e"),
      element_at(col("xs"), 1).as("prev"),
      lit(0L).as("sn"), lit(0L).as("se"), lit(0L).as("sh"))
    val folded = series.select(col("event_type"), col("n_days"),
      aggregate(seq2, init, (acc, el) => {
        val x = el.getField("x"); val j = el.getField("j")
        val inWin = j >= n - 6
        val l2c = lit(0.5) * x +
          lit(0.5) * (acc.getField("l") + acc.getField("t"))
        struct(
          l2c.as("l"),
          (lit(0.5) * (l2c - acc.getField("l")) +
            lit(0.5) * acc.getField("t")).as("t"),
          (acc.getField("e") +
            lit(0.5) * (x - acc.getField("e"))).as("e"),
          x.as("prev"),
          (acc.getField("sn") + when(inWin,
            err6(x, acc.getField("prev"))).otherwise(0L)).as("sn"),
          (acc.getField("se") + when(inWin,
            err6(x, acc.getField("e"))).otherwise(0L)).as("se"),
          (acc.getField("sh") + when(inWin,
            err6(x, acc.getField("l") + acc.getField("t")))
            .otherwise(0L)).as("sh"))
      }).as("st"))
    def row(model: String, field: String): DataFrame =
      folded.select(col("event_type"), lit(model).as("model"),
        lit(7L).as("n_evals"),
        round(col("st").getField(field).cast("double") / 7.0 / 1e6, 6)
          .as("mae"))
    row("naive", "sn").unionAll(row("ewma", "se"))
      .unionAll(row("holt", "sh"))
  }

  /** Theil-Sen robust trend per event type: the MEDIAN of all pairwise
    * slopes (c_j − c_i)/(day_j − day_i) over the daily revenue series —
    * the 29%-breakdown trend estimator beside [[anomalyMad]]'s robust
    * scale (one wild day drags an OLS slope; the pairwise-slope median
    * shrugs it off).
    *
    * Exactness: each slope quantizes to integer 1e-4-cent-per-day units
    * BEFORE the median, and the median itself uses the ×2
    * exact-interpolation trick (`2·median` of ints is an int for any
    * parity) — the anomalyMad discipline; one final division.
    *
    * Scale shape: the pair join runs on the DAYS-sized rollup
    * (days²/2 pairs per type regardless of event count — the rollup-
    * first discipline that makes an O(n²) estimator safe: n is 30, not
    * 60k). Output: (event_type, n_days, n_pairs, slope_per_day
    * rounded 6, dollars/day).
    */
  def theilSenTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    val a = daily.select(col("event_type"), col("day").as("d1"),
      col("dc").as("c1"))
    val b = daily.select(col("event_type"), col("day").as("d2"),
      col("dc").as("c2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .select(col("event_type"),
        round((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double") * 1e4, 0)
          .cast("long").as("s4"))
    val nd = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(percentile(col("s4"), lit(0.5)) * 2, 0).cast("long")
          .as("med2"))
      .join(broadcast(nd), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        round(col("med2").cast("double") / 2e6, 6).as("slope_per_day"))
  }

  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
    // per-type totals as whole-partition windows over the days-sized
    // rollup — one events pass total (a groupBy+join would scan twice)
    val wAll = Window.partitionBy(col("event_type"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = daily
      .withColumn("sx", sum(col("dc")).over(wAll))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("dc")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("s", col("nd") * col("cum") - col("t") * col("sx"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("day").asc)
    scored.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        round(abs(col("s")).cast("double") / (col("nd") * 100.0), 6)
          .as("peak_dev"))
  }

  /** First-order Markov transition matrix of event types per user
    * stream: for every (prev → next) adjacent pair in each user's
    * (ts, event_id)-ordered sequence, the transition count and its
    * row-normalized probability. The sequence-model summary a behavior
    * pipeline trains on, and the base relation of anomaly scoring on
    * rare transitions.
    *
    * Scale shape: one lag window per user partition (the same shuffle
    * the session ops already pay), then a groupBy on (from, to) — at
    * most |types|² output rows. The row-normalizing window runs over
    * that tiny aggregate, not the event stream. Output: (from_type,
    * to_type, n, p rounded 6).
    */
  /** Sequential-pattern SUPPORT of every ordered event-type pair — the
    * GSP/PrefixSpan support statistic at length 2: a user supports
    * (a → b) when SOME a-event strictly precedes SOME b-event,
    * anywhere in their history (not necessarily adjacent — the
    * statistic [[typeTransitions]]' adjacent bigrams cannot express).
    * The existential collapses exactly to min_ts(a) < max_ts(b) over
    * the per-(user, type) envelope — which also covers the diagonal
    * (a → a ⟺ two events of a at distinct times) — so support
    * counting never enumerates event pairs.
    *
    * Scale shape: one partial-aggregated rollup to the |users|×|types|
    * envelope relation, a self equi-join ON USER of that envelope
    * (typed-bounded fan-out |types|² per user), one |types|²-group
    * rollup; the raw event table is scanned once. Output:
    * (type_a, type_b, n_users, permille of all users).
    */
  def sequenceSupport(spark: SparkSession, dir: String): DataFrame = {
    val env = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val a = env.select(col("user_id"), col("event_type").as("type_a"),
      col("mn"))
    val b = env.select(col("user_id"), col("event_type").as("type_b"),
      col("mx"))
    val tot = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id")).as("n_total"))
    a.join(b, Seq("user_id")).filter(col("mn") < col("mx"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_users"),
        expr("n_users * 1000 div n_total").as("permille"))
  }

  def typeTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    val counts = pairs.groupBy(col("prev").as("from_type"),
      col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.select(col("from_type"), col("to_type"), col("n"),
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 6).as("p"))
  }

  /** HELD-OUT next-event prediction accuracy of the Markov bigram
    * model — the train/eval split applied to [[typeTransitions]]: fit
    * argmax(next | prev) on the 80% user split (user_id % 5 ≠ 4,
    * ties to the lexicographically smaller type), score every
    * held-out adjacent transition, report per-prev-type accuracy
    * beside the majority-class baseline the model must beat to be
    * worth shipping. Pure integer counting end to end.
    *
    * Scale shape: train = one bigram rollup (|types|² rows) + a
    * |types|-row argmax window; test transitions join the broadcast
    * model by prev type; one |types|-row fold out. The event table
    * shuffles once per side (the lag window's user partitioning).
    * Output: (from_type, predicted, n_test, n_correct, acc_permille,
    * baseline_permille).
    */
  def markovHoldoutAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("prev"), col("event_type").as("nxt"))
    val isTest = col("user_id") % 5 === 4
    val model = pairs.filter(!isTest)
      .groupBy(col("prev"), col("nxt")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("prev"))
        .orderBy(col("n").desc, col("nxt").asc)))
      .filter(col("rk") === 1)
      .select(col("prev"), col("nxt").as("predicted"))
    // majority-class baseline: the single most frequent NEXT type in
    // train, independent of prev (what a prior-only predictor does)
    val base = pairs.filter(!isTest)
      .groupBy(col("nxt")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("nxt").asc)))
      .filter(col("rk") === 1)
      .select(col("nxt").as("base_pred"))
    pairs.filter(isTest)
      .join(broadcast(model), Seq("prev"))
      .crossJoin(broadcast(base))
      .groupBy(col("prev").as("from_type"), col("predicted"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nxt") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"),
        sum(when(col("nxt") === col("base_pred"), 1L).otherwise(0L))
          .as("n_base"))
      .select(col("from_type"), col("predicted"), col("n_test"),
        col("n_correct"),
        expr("n_correct * 1000 div n_test").as("acc_permille"),
        expr("n_base * 1000 div n_test").as("baseline_permille"))
  }

  /** Stationary distribution of the [[typeTransitions]] Markov chain:
    * where the user flow settles if the observed transition behavior
    * persists — the long-run share of attention per event type, read
    * against the raw frequency histogram to see which types RETAIN
    * flow vs merely receive it. Three power-iteration rounds from the
    * uniform start over the |types|²-row transition relation (the
    * [[graft.operators.GraphOps.pageRank]] discipline: per-round 9 dp
    * quantization, final 6 dp; a fixed round count keeps the oracle a
    * finite unrolled chain). Output: (event_type, stationary), one
    * row per type.
    */
  def markovStationary(spark: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    markovStationaryOf(pairs.groupBy(col("prev").as("src"),
      col("event_type").as("dst")).agg(count(lit(1)).as("n")), iters)
  }

  /** The power iteration itself over an arbitrary (src, dst, n)
    * transition-count relation — exposed so EventOpsSpec can pin the
    * sink-closure semantics on a synthetic chain with a terminal type.
    */
  private[graft] def markovStationaryOf(counts: DataFrame,
      iters: Int): DataFrame = {
    val trans = counts
      .select(col("src"), col("dst"),
        (col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("src")))).as("p"))
      .cache()
    // the node set is the UNION of sources and destinations: a type
    // seen only as a destination (a terminal/sink event with no
    // outgoing transitions) would otherwise absorb mass in one power
    // round and leak it the next, so the output wouldn't sum to 1.
    // Sinks get the standard self-loop closure (p=1 to themselves),
    // which conserves total mass every round (r6 advice item).
    val nodes = trans.select(col("src").as("t"))
      .unionAll(trans.select(col("dst").as("t"))).distinct().cache()
    val srcs = trans.select(col("src").as("t")).distinct()
    val trans2 = trans.unionAll(
        nodes.join(srcs, Seq("t"), "left_anti")
          .select(col("t").as("src"), col("t").as("dst"), lit(1.0).as("p")))
      .cache()
    val k = nodes.count().toDouble
    var pi = nodes.select(col("t"), lit(1.0 / k).as("pi"))
    (1 to iters).foreach { _ =>
      pi = trans2.join(pi, trans2("src") === pi("t"))
        .groupBy(col("dst"))
        .agg(round(sum(col("pi") * col("p")), 9).as("pi"))
        .select(col("dst").as("t"), col("pi"))
    }
    // one row per NODE, including types whose mass drained to 0 (they
    // drop out of the join otherwise) — the one-row-per-type contract
    nodes.join(pi, Seq("t"), "left")
      .select(col("t").as("event_type"),
        round(coalesce(col("pi"), lit(0.0)), 6).as("stationary"))
  }

  /** MATCH_RECOGNIZE-lite event-pattern matching: each user's stream
    * collapses to a character sequence (one char per event type, in
    * (ts, event_id) order) and a regex runs over it — here 'v+p'
    * (one-or-more views directly followed by a purchase, the classic
    * browse-then-buy motif) plus the longest uninterrupted view run.
    * This is the compose-don't-build answer to SQL MATCH_RECOGNIZE:
    * sequence-to-string + regexp_count expresses the same class of
    * adjacent-pattern queries with engine-native, codegen'd pieces.
    *
    * Scale shape: one groupBy(user) with a sort_array of (us, eid,
    * char) structs — per-group state is the user's OWN event count
    * (the per-key sequence any sequence matcher must hold; a capped
    * `slice` bounds it if a key is pathological). No window-function
    * full sort, no cross-row regex state. Output: (user_id, n_events,
    * n_conversions, max_view_run nullable).
    */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    val s = struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
      substring(col("event_type"), 1, 1).as("c"))
    Tables.events(spark, dir)
      .select(col("user_id"), s.as("s"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("s"))).as("seq"))
      .select(col("user_id"), size(col("seq")).cast("long").as("n_events"),
        concat_ws("", transform(col("seq"), x => x.getField("c")).cast("array<string>"))
          .as("seq_str"))
      .select(col("user_id"), col("n_events"),
        regexp_count(col("seq_str"), lit("v+p")).cast("long")
          .as("n_conversions"),
        array_max(transform(regexp_extract_all(col("seq_str"), lit("v+"), lit(0)),
          x => length(x))).cast("long").as("max_view_run"))
  }
}
