package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.functions.ExactNum._
import graft.operators.ScaleTechniques

class ScaleTechniquesSpec extends SparkSpec {

  test("salted two-stage agg equals the direct groupBy") {
    val salted = ScaleTechniques.saltedEventAgg(spark, sf0001)
      .orderBy("event_type").collect()
    val direct = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy("event_type").collect()
    assert(salted.sameElements(direct))
  }

  test("bucketed tables co-locate: join runs with zero shuffles") {
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
    // two tables bucketed the same way on the join key
    graft.sources.Ingest.writeBucketed(ev, "ev_a", Seq("user_id"), 8)
    graft.sources.Ingest.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("n_ev")), "ev_b",
      Seq("user_id"), 8)
    val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"bucketed join should not shuffle, found ${shuffles.size}:\n$plan")
    assert(joined.count() == Tables.events(spark, sf0001).count())
  }

  test("join strategy hints are honored: shuffle_hash avoids both sort passes") {
    val ord = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val j = li.join(ord.hint("shuffle_hash"),
      li("l_orderkey") === ord("o_orderkey"))
    j.count()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"shuffle_hash hint not honored:\n$plan")
    val merge = li.join(ord.hint("merge"),
      li("l_orderkey") === ord("o_orderkey"))
    merge.count()
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "merge hint must force a sort-merge join")
  }
}
