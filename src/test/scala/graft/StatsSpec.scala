package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {

  test("correlation matrix equals Spark's builtin corr per pair") {
    val got = Stats.correlationMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.size == 6)
    val li = Tables.lineitem(spark, sf0001)
    got.keys.foreach { case (a, b) =>
      val builtin = li.agg(corr(col(a), col(b))).head().getDouble(0)
      // builtin corr runs on raw doubles (merge-order co-moments); the
      // declared output is rounded to 6dp, so agreement is bounded by
      // that rounding granularity
      assert(math.abs(got((a, b)) - builtin) < 5e-7,
        s"corr($a, $b): ${got((a, b))} vs builtin $builtin")
    }
  }

  test("chi-square statistic matches a driver-side recomputation") {
    val out = Stats.chiSquareIndependence(spark, sf0001).head()
    val (chi2, dof, n) = (out.getDouble(0), out.getLong(1), out.getLong(2))

    val cells = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority", "c_mktsegment").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val total = cells.map(_._2).sum
    val micros = cells.map { case ((a, b), o) =>
      val e = rowT(a).toDouble * colT(b).toDouble / total.toDouble
      math.round(math.pow(o.toDouble - e, 2) / e * 1e6)
    }.sum
    assert(chi2 == micros / 1e6, s"$chi2 vs ${micros / 1e6}")
    assert(dof == (rowT.size - 1).toLong * (colT.size - 1))
    assert(n == total)
    assert(chi2 >= 0.0)
  }
}
