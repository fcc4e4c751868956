package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations

/** Declarative expectation suite: fixture truth + a corrupted
  * synthetic proving every violation class is actually counted (the
  * fixture passes all checks — green alone would be vacuous).
  */
class ExpectationsSpec extends SparkSpec {

  test("fixture suite: exactly the real fixture defect fails, rest pass") {
    val rows = Expectations.suite(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 9)
    val nOrders = Tables.orders(spark, sf0001).count()
    val li = Tables.lineitem(spark, sf0001)
    val nLines = li.count()
    // the synthetic fixture genuinely duplicates (l_orderkey,
    // l_linenumber) — the suite's job is to CATCH that, so the check
    // must fail with the exact driver-recomputed violation count
    val dupCount = nLines -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(dupCount > 0, "fixture defect disappeared — re-pin this spec")
    rows.foreach { case (check, nChecked, nViol, passed) =>
      if (check == "lineitem.(l_orderkey,l_linenumber) unique") {
        assert(nViol == dupCount && passed == 0, s"$check: $nViol")
      } else {
        assert(nViol == 0L && passed == 1, s"$check: $nViol violations")
      }
      if (check.startsWith("orders")) assert(nChecked == nOrders)
      if (check.startsWith("lineitem")) assert(nChecked == nLines)
    }
  }

  test("corrupted tables: every violation class is counted exactly") {
    import spark.implicits._
    // 2 null custkeys, 1 duplicate orderkey, 1 nonpositive price,
    // 1 bad status, 2 orphaned custkeys (10/11 - customer has 1..5)
    val o = Seq(
      (1L, Option(1L), "O", 10.0, "1995-01-01", "1-URGENT"),
      (2L, Option(2L), "F", 20.0, "1995-01-02", "1-URGENT"),
      (2L, Option(3L), "P", 30.0, "1995-01-03", "1-URGENT"),
      (4L, None, "O", 40.0, "1995-01-04", "1-URGENT"),
      (5L, None, "X", 0.0, "1995-01-05", "1-URGENT"),
      (6L, Option(10L), "O", 60.0, "1995-01-06", "1-URGENT"),
      (7L, Option(11L), "O", 70.0, "1995-01-07", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // 1 duplicate (orderkey, linenumber), 1 nonpositive qty,
    // 1 out-of-range discount, 1 orphaned orderkey (99)
    val l = Seq(
      (1L, 1, 5.0, 0.05), (1L, 1, 5.0, 0.05), (2L, 1, 0.0, 0.05),
      (2L, 2, 3.0, 0.9), (99L, 1, 1.0, 0.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val c = Seq(1L, 2L, 3L, 4L, 5L).toDF("c_custkey")
    val got = Expectations.suiteOf(o, l, c).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(got("orders.o_custkey complete") == ((7L, 2L, 0)))
    assert(got("orders.o_orderkey unique") == ((7L, 1L, 0)))
    assert(got("orders.o_totalprice positive") == ((7L, 1L, 0)))
    assert(got("orders.o_orderstatus in (O,F,P)") == ((7L, 1L, 0)))
    assert(got("lineitem.(l_orderkey,l_linenumber) unique") == ((5L, 1L, 0)))
    assert(got("lineitem.l_quantity positive") == ((5L, 1L, 0)))
    assert(got("lineitem.l_discount in [0,0.5]") == ((5L, 1L, 0)))
    // null custkeys are not orphans (they fail completeness instead);
    // 10 and 11 are
    assert(got("orders.o_custkey -> customer") == ((7L, 2L, 0)))
    assert(got("lineitem.l_orderkey -> orders") == ((5L, 1L, 0)))
  }

  test("NULL-key uniqueness pins its semantics on a synthetic with NULLs") {
    import spark.implicits._
    // 8 rows: 3 NULL-bearing (two with NULL k1, one with NULL k2),
    // 5 non-NULL carrying 3 distinct keys -> 2 duplicates; the
    // (1,1) pair ALSO appears under a NULL row — it must not merge
    val keys = Seq(
      (Option(1L), Option(1)), (Option(1L), Option(1)),
      (Option(1L), Option(2)), (Option(2L), Option(1)),
      (Option(1L), Option(2)),
      (None: Option[Long], Option(1)), (None: Option[Long], Option(1)),
      (Option(1L), None: Option[Int]))
      .toDF("k1", "k2")
    val r = Expectations.nullKeyUniquenessOf(keys).collect()(0)
    assert(r.getLong(1) == 8L, "n_rows")
    assert(r.getLong(2) == 3L, "n_nullkey_rows")
    assert(r.getLong(3) == 5L, "n_nonnull_rows")
    assert(r.getLong(4) == 3L, "n_distinct_keys")
    assert(r.getLong(5) == 2L, "n_duplicates")
    assert(r.getInt(6) == 0, "passed")
  }

  test("declared NULL-key row exercises every metric on the fixture") {
    val r = Expectations.nullKeyUniqueness(spark, sf0001).collect()(0)
    assert(r.getLong(2) > 0L, "derived key should bear NULLs")
    assert(r.getLong(5) > 0L, "mod-collapsed key should bear duplicates")
    assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    assert(r.getLong(3) == r.getLong(4) + r.getLong(5))
  }

  test("FD audit counts violating groups and rows exactly") {
    import spark.implicits._
    // groups: a->(x,x,y) violates with 3 rows; b->(x) holds (2 rows);
    // c->(y,z,z) violates with 3 rows
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
      ("b", "x"), ("c", "y"), ("c", "z"), ("c", "z")).toDF("l", "r")
    val got = Expectations.fdAuditOf(df, "t", "l", "r").collect()(0)
    assert(got.getString(0) == "t.l -> r")
    assert(got.getLong(1) == 8L, "n_rows")
    assert(got.getLong(2) == 3L, "n_groups")
    assert(got.getLong(3) == 2L, "n_violating_groups")
    assert(got.getLong(4) == 6L, "n_violating_rows")
    assert(got.getInt(5) == 0, "holds")
    // a holding FD
    val ok = Expectations.fdAuditOf(
      Seq(("a", "x"), ("b", "y")).toDF("l", "r"), "t", "l", "r")
      .collect()(0)
    assert(ok.getLong(3) == 0L && ok.getInt(5) == 1)
  }

  test("declared FD candidates mix holding and violated dependencies") {
    val rows = Expectations.fdViolations(spark, sf0001).collect()
    assert(rows.length == 6)
    val byFd = rows.map(r => r.getString(0) -> r.getInt(5)).toMap
    assert(byFd("nation.n_nationkey -> n_regionkey") == 1, "key FD holds")
    assert(byFd.values.count(_ == 0) >= 3, "violated candidates present")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "violating rows bounded")
      assert(r.getLong(3) <= r.getLong(2), "violating groups bounded")
    }
  }
}
