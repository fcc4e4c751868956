package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  test("orders profile replays driver-side column stats") {
    val o = Tables.orders(spark, sf0001).collect()
    val n = o.length.toLong
    val got = Profiling.profileOrders(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(got.size == 6 && got.values.forall(_._1 == n))
    val keys = o.map(_.getLong(0))
    assert(got("o_orderkey") ==
      (n, n, keys.distinct.length.toLong, keys.min.toString, keys.max.toString))
    val status = o.map(_.getString(2))
    assert(got("o_orderstatus") ==
      (n, n, status.distinct.length.toLong, status.min, status.max))
    val cents = o.map(r => math.round(r.getDouble(3) * 100))
    assert(got("o_totalprice_cents") ==
      (n, n, cents.distinct.length.toLong, cents.min.toString, cents.max.toString))
  }

  test("profile branches prune columns and avoid the Expand blowup") {
    val plan = Profiling.profileOrders(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one pruned scan per column branch, and no |columns|x row Expand
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 6, s"expected 6 pruned branch scans, got $scans")
    assert(!plan.contains("Expand"), plan.take(800))
    // each branch reads at most the columns its stats need
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.forall(s => s.isEmpty || s.count(_ == ',') <= 1),
      schemas.mkString("; "))
  }
}
