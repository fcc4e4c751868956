package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {

  test("tumbling windows partition all events exactly once") {
    val total = EventOps.tumbling(spark, sf0001)
      .agg(sum("n")).head().getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
  }

  test("sliding windows (10m width, 5m slide) count every event twice") {
    val total = EventOps.sliding(spark, sf0001)
      .agg(sum("n")).head().getLong(0)
    assert(total == 2 * Tables.events(spark, sf0001).count())
  }

  test("sessions: event counts are conserved and gaps respected") {
    val sess = EventOps.sessions(spark, sf0001)
    val totalEvents = sess.agg(sum("n_events")).head().getLong(0)
    assert(totalEvents == Tables.events(spark, sf0001).count())
    // session starts within a user are > 30 min apart
    val viol = sess.selectExpr("user_id", "session_start_us")
      .withColumn("prev", lag("session_start_us", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_start_us")))
      .filter(col("prev").isNotNull &&
        col("session_start_us") - col("prev") <= 1800L * 1000000L)
      .count()
    assert(viol == 0)
  }

  test("json stats: k extracted as integer for every event type") {
    val rows = EventOps.jsonStats(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Long]("n") > 0 &&
      !r.isNullAt(r.fieldIndex("avg_k"))))
  }

  test("native session_window equals the analytic-window sessions") {
    val cols = Seq("user_id", "session_start_us", "n_events", "sum_value")
    val a = EventOps.sessions(spark, sf0001)
      .select(cols.head, cols.tail: _*).collect().toSet
    val b = EventOps.sessionsNative(spark, sf0001).collect().toSet
    assert(a == b, s"analytic ${a.size} vs native ${b.size} sessions")
  }
}
