package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {

  test("asof: hand fixture — inclusive match, latest-wins, tie by max id") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("key", "us", "id")
    val right = Seq(
      (1L, 100L, 1L), // equal ts -> inclusive match for left id=10
      (1L, 100L, 2L), // same ts tie -> id=2 wins
      (1L, 150L, 3L), // latest before 200
      (2L, 60L, 4L))  // after left id=12 -> no match
      .toDF("key", "us", "id")
    val got = TemporalJoins.asofPrev(left, right)
      .orderBy("id").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.sameElements(Array((10L, 2L), (11L, 3L), (12L, -1L))))
  }

  test("asof on events: every error row present exactly once") {
    val df = TemporalJoins.asofErrorClick(spark, sf0001).cache()
    val nErr = Tables.events(spark, sf0001)
      .filter(col("event_type") === "error").count()
    assert(df.count() == nErr)
    assert(df.select("event_id").distinct().count() == nErr)
    // matched gaps are non-negative (preceding only)
    assert(df.filter(col("gap_us") < 0).count() == 0)
  }

  test("range join matches the brute-force inequality join") {
    val got = TemporalJoins.eventsWithin5min(spark, sf0001)
      .select("event_a", "event_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val brute = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.us") - col("b.us")) <= 300000000L)
      .select(col("a.event_id"), col("b.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
  }

  test("asofNext: earliest following match, tolerance nulls, id tie-break") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 500L, 11L), (2L, 100L, 12L))
      .toDF("key", "us", "id")
    val right = Seq(
      (1L, 100L, 20L), (1L, 100L, 21L), // equal-ts: inclusive, min id wins
      (1L, 900L, 22L),                  // within tol of left 500 (gap 400)
      (2L, 9999L, 23L))                 // beyond tol of left 100
      .toDF("key", "us", "id")
    val got = graft.operators.TemporalJoins.asofNext(left, right, tolUs = 500L)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got == Set(
      (10L, 20L, 0L),   // ts tie -> inclusive match, min id 20
      (11L, 22L, 400L), // next following within tolerance
      (12L, -1L, -1L))) // only candidate beyond tolerance -> null
  }

  test("relational: full outer keeps nations missing on either side; cube counts") {
    val cov = graft.operators.Relational.nationCoverage(spark, sf0001).cache()
    // suppliers exist in <= 10 nations, customers in more; all kept
    assert(cov.filter(col("n_supp") === 0).count() > 0)
    assert(cov.filter(col("n_cust") === 0 && col("n_supp") === 0).count() == 0)
    val cube = graft.operators.Relational.cubeLineitem(spark, sf0001)
    // cube rows = detail + rf partials + ls partials + grand total
    val detail = cube.filter(col("l_returnflag").isNotNull &&
      col("l_linestatus").isNotNull).count()
    val total = cube.count()
    assert(cube.filter(col("l_returnflag").isNull &&
      col("l_linestatus").isNull).count() == 1)
    assert(total > detail + 1)
  }
}
