package graft

import graft.operators.Relational

/** Row-level sanity plus PLAN-SHAPE assertions: the scale contract is
  * that dims broadcast, filters push into the parquet scan, and aggs are
  * partial. These assertions fail if a code change regresses the plan.
  */
class RelationalSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan") {
    val plan = physicalPlan(Relational.q1PricingSummary(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("HashAggregate"), "expected partial hash aggregation")
  }

  test("q1: six groups, charge >= disc_price >= 0") {
    val rows = Relational.q1PricingSummary(spark, sf0001).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val discPrice = r.getAs[Double]("sum_disc_price")
      val charge = r.getAs[Double]("sum_charge")
      assert(charge >= discPrice && discPrice >= 0)
    }
  }

  test("q3: customer and orders sides are broadcast (no fact shuffle join)") {
    val plan = physicalPlan(Relational.q3ShippingPriority(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"lineitem should never sort-merge against broadcast dims:\n$plan")
  }

  test("q5: returns revenue per European nation, descending") {
    val rows = Relational.q5RegionRevenue(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("topk per segment: exactly 5 per segment, descending within") {
    val rows = Relational.topOrdersPerSegment(spark, sf0001).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.size == 5 && bySeg.values.forall(_.length == 5))
  }

  test("rollup emits detail + subtotal + grand-total rows") {
    val rows = Relational.rollupLineitem(spark, sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && subtotals.nonEmpty)
    assert(grand.head.getAs[Long]("n") == 6000)
  }

  test("semi/anti partition the customers consistently") {
    val urgent = Relational.customersWithUrgentOrders(spark, sf0001).count()
    val noOrders = Relational.customersWithoutOrders(spark, sf0001).count()
    val total = Tables.customer(spark, sf0001).count()
    assert(urgent <= total && noOrders <= total)
  }
}
