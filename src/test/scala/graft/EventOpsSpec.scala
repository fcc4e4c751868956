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

  test("histogram quantiles: intervals enclose the true type-1 quantile") {
    val hist = EventOps.valueQuantilesHistogram(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val data = Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    assert(hist.keySet == data.keySet)
    for ((t, cents) <- data) {
      val n = cents.length
      val q50 = cents((n + 1) / 2 - 1) / 100.0 // type-1: value at rank ceil(qn)
      val q90 = cents((9 * n + 9) / 10 - 1) / 100.0
      val (lo50, hi50, lo90, hi90) = hist(t)
      assert(lo50 <= q50 && q50 < hi50, s"$t p50 $q50 not in [$lo50,$hi50)")
      assert(lo90 <= q90 && q90 < hi90, s"$t p90 $q90 not in [$lo90,$hi90)")
      assert(math.abs(hi50 - lo50 - 5.0) < 1e-9) // declared step width
    }
  }

  test("native session_window equals the analytic-window sessions") {
    val cols = Seq("user_id", "session_start_us", "n_events", "sum_value")
    val a = EventOps.sessions(spark, sf0001)
      .select(cols.head, cols.tail: _*).collect().toSet
    val b = EventOps.sessionsNative(spark, sf0001).collect().toSet
    assert(a == b, s"analytic ${a.size} vs native ${b.size} sessions")
  }

  test("approx quantiles: rank error within the sketch's 1/accuracy bound") {
    val acc = 1000
    val approx = EventOps.valueQuantilesApprox(spark, sf0001, acc).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val data = Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    assert(approx.keySet == data.keySet)
    for ((t, vals) <- data; (p, got) <- Seq(0.5 -> approx(t)._1, 0.9 -> approx(t)._2)) {
      // the sketch guarantee: the returned value's true rank is within
      // n/accuracy of the target rank (cent rounding adds nothing here)
      val below = vals.count(_ <= got + 0.005).toDouble
      val atLeast = vals.count(_ >= got - 0.005).toDouble
      val n = vals.length.toDouble
      assert(below / n >= p - 1.0 / acc - 1e-9 &&
        atLeast / n >= (1 - p) - 1.0 / acc - 1e-9,
        s"$t p$p: $got outside rank tolerance (n=$n)")
    }
  }

  test("sketch quantiles: within one bucket width of exact, merge-order free") {
    val step = 5.0 // 500 cents in display units
    val sketch = EventOps.valueQuantilesSketch(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = EventOps.valueQuantiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(sketch.keySet == exact.keySet)
    for ((t, (p50, p90)) <- sketch) {
      assert(math.abs(p50 - exact(t)._1) <= step,
        s"$t p50 $p50 vs exact ${exact(t)._1}")
      assert(math.abs(p90 - exact(t)._2) <= step,
        s"$t p90 $p90 vs exact ${exact(t)._2}")
    }
    // histogram state is commutative integer sums, so a fresh run
    // (new task scheduling, new merge order) must be bit-identical —
    // the property percentile_approx lacks
    val rerun = EventOps.valueQuantilesSketch(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rerun == sketch)
  }

  test("funnel: stages replay a driver-side per-user scan") {
    val got = EventOps.funnel(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getInt(4))).sortBy(_._1)
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).flatMap { case (u, g) =>
      val fv = g.filter(_._2 == "view").map(_._3).minOption
      fv.map { v =>
        val fc = g.filter(e => e._2 == "click" && e._3 > v).map(_._3).minOption
        val fp = fc.flatMap(c =>
          g.filter(e => e._2 == "purchase" && e._3 > c).map(_._3).minOption)
        (u, v, fc, fp, 1 + fc.size + fp.size)
      }
    }.toArray.sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(expect))
    // the funnel narrows monotonically
    assert(got.count(_._5 >= 2) <= got.length &&
      got.count(_._5 == 3) <= got.count(_._5 >= 2))
  }

  test("incremental agg: merged partials equal the full recompute") {
    val full = Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(col("c")) / 100.0).as("sum_value"),
        (min(col("c")) / 100.0).as("min_value"),
        (max(col("c")) / 100.0).as("max_value"),
        round(sum(col("c")).cast("double") / count(lit(1)) / 100.0, 6)
          .as("avg_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val got = EventOps.incrementalAgg(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got.keySet == full.keySet && got.nonEmpty)
    val off = got.filter { case (k, v) => full(k) != v }
    assert(off.isEmpty, s"diff=${off.take(3)}")
  }

  test("rolling 7d: RANGE frame replays a driver-side calendar window") {
    val daily = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).cast("string").as("day"), col("event_type"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(p => (p._2, p._1))
      .map { case ((t, d), g) => (t, d, g.length.toLong, g.map(_._3).sum) }
      .toSeq
    def epochDay(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val expect = daily.map { case (t, d, _, _) =>
      val frame = daily.filter(r => r._1 == t &&
        epochDay(r._2) >= epochDay(d) - 6 && epochDay(r._2) <= epochDay(d))
      val (sn, ss) = (frame.map(_._3).sum, frame.map(_._4).sum)
      (t, d) -> ((ss / 100.0, BigDecimal(ss.toDouble / sn / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = EventOps.rolling7d(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    val off = got.filter { case (k, v) =>
      math.abs(v._1 - expect(k)._1) > 1e-9 ||
      math.abs(v._2 - expect(k)._2) > 1e-9 }
    assert(off.isEmpty, s"diff=${off.take(3)}")
  }

  test("state islands: run-length encoding replays a driver-side scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e._4, e._3))
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)] // type, start, end, n
      sorted.foreach { e =>
        if (runs.nonEmpty && runs.last._1 == e._2) {
          val l = runs.last
          runs(runs.length - 1) = (l._1, l._2, e._4, l._4 + 1)
        } else runs += ((e._2, e._4, e._4, 1L))
      }
      runs.zipWithIndex.map { case ((t, s, e, n), i) =>
        (u, (i + 1).toLong) -> ((t, s, e, n))
      }
    }
    val got = EventOps.stateIslands(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    val off = got.filter { case (k, v) => expect(k) != v }
    assert(off.isEmpty, s"diff=${off.take(3)}")
    // segmentation covers every event exactly once
    assert(got.values.map(_._4).sum == ev.length)
  }

  test("histogram: buckets partition every event; bounds consistent") {
    val width = 5000
    val h = EventOps.histogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val total = Tables.events(spark, sf0001).count()
    assert(h.map(_._4).sum == total)
    assert(h.forall { case (_, b, lo, _) => lo == b * width / 100.0 })
    // cents c lands in bucket floor(c/width): recheck per event
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), graft.functions.ExactNum.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = ev.groupBy { case (t, c) =>
      (t, math.floor(c.toDouble / width).toLong)
    }.map { case (k, g) => k -> g.length.toLong }
    assert(h.map(r => (r._1, r._2) -> r._4).toMap == expect)
  }

  test("winsorized mean replays an R-7 driver-side computation") {
    val byType = Tables.events(spark, sf0001)
      .select(col("event_type"), graft.functions.ExactNum.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    def r7(sorted: Array[Long], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    val expect = byType.map { case (t, g) =>
      val cs = g.map(_._2).sorted
      val (blo, bhi) = (r7(cs, 0.05), r7(cs, 0.95))
      val smid = cs.filter(c => c >= blo && c <= bhi).sum
      val nlo = cs.count(_ < blo); val nhi = cs.count(_ > bhi)
      t -> ((cs.length.toLong, BigDecimal(
        (smid + nlo * blo + nhi * bhi) / cs.length / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = EventOps.winsorizedMean(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (t, (n, m)) =>
      assert(n == expect(t)._1 && math.abs(m - expect(t)._2) < 1e-9, t)
    }
  }

  test("retention cohorts: the first-seen dimension joins broadcast") {
    val plan = EventOps.retentionCohorts(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort dimension must broadcast (|users|-sized at any event volume):\n$plan")
  }

  test("retention cohorts: triangular matrix replays a driver-side scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val firstDay = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    def epochDay(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val expect = ev.map { case (u, d) =>
      (firstDay(u), (epochDay(d) - epochDay(firstDay(u))).toInt, u)
    }.distinct.groupBy(p => (p._1, p._2))
      .map { case (k, g) => k -> g.size.toLong }
    val got = EventOps.retentionCohorts(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expect && got.nonEmpty)
    // offset 0 exists for every cohort (a user is active on their first day)
    assert(got.keys.map(_._1).toSet.forall(c => got.contains((c, 0))))
  }

  test("ohlc bars replay a driver-side per-bar scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(e => (e._1, e._2 / 3600000000L)).map { case (k, g) =>
      val sorted = g.sortBy(e => (e._2, e._3))
      k -> (sorted.head._4 / 100.0, g.map(_._4).max / 100.0,
        g.map(_._4).min / 100.0, sorted.last._4 / 100.0, g.size.toLong)
    }
    val got = EventOps.ohlcBars(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got == expect && got.nonEmpty)
    // price ordering invariant: low <= open, close <= high
    got.values.foreach { case (o, h, l, c, _) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("day-over-day movers: deltas replay the daily rollup chain") {
    val rows = EventOps.dayOverDayMovers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(3),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._3.isEmpty) // first day has no predecessor
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur._3.contains(prev._4)) // prev_sum = predecessor's sum
          assert(cur._5.exists(d => math.abs(d - (cur._4 - prev._4)) < 1e-9))
        case _ => ()
      }
    }
    assert(rows.nonEmpty)
  }

  test("seasonal-naive forecast: error is |actual - forecast|, hist excludes dmax") {
    import java.time.LocalDate
    val rows = EventOps.seasonalNaiveForecast(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, a, f, e) =>
      assert(math.abs(e - math.rint(math.abs(a - f) * 1e6) / 1e6) < 1e-9)
    }
    // replay one cell's forecast from prior-day events
    val (t, h, _, f, _) = rows.head
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("day"),
        hour(col("ts")).as("hod"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val dmax = ev.map(_._2).max
    val hist = ev.filter(e => e._1 == t && e._3 == h &&
      LocalDate.parse(e._2).isBefore(LocalDate.parse(dmax)))
    val expect = math.rint(hist.map(_._4).sum.toDouble / hist.length
      / 100.0 * 1e6) / 1e6
    assert(math.abs(f - expect) < 1e-9, s"$t/$h: $f vs $expect")
  }

  test("hourly seasonality partitions every event into 24 hod buckets") {
    val rows = EventOps.hourlySeasonality(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum == Tables.events(spark, sf0001).count())
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 23))
    // replay one cell exactly
    val (t, h, n, avg) = rows.head
    val cell = Tables.events(spark, sf0001)
      .filter(col("event_type") === t && hour(col("ts")) === h)
      .select(round(col("value") * 100).cast("long").as("c")).collect()
      .map(_.getLong(0))
    assert(cell.length.toLong == n)
    assert(math.abs(avg - math.rint(cell.sum.toDouble / n / 100.0 * 1e6) / 1e6)
      < 1e-9)
  }

  test("cumulative distinct users replays a driver-side running set") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val days = g.map(_._3).distinct.sorted
      val seen = scala.collection.mutable.Set.empty[Long]
      days.map { d =>
        val today = g.filter(_._3 == d).map(_._2).distinct
        val newU = today.count(!seen(_))
        seen ++= today
        (t, d) -> ((newU.toLong, today.length.toLong, seen.size.toLong))
      }
    }.toMap
    val got = EventOps.cumulativeDistinctUsers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("scd2: versions chain gaplessly, one current row per user") {
    val rows = EventOps.scd2UserStates(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // exactly the last version is current (null valid_to)
      assert(sorted.init.forall(v => v._5.isDefined && v._6 == 0))
      assert(sorted.last._5.isEmpty && sorted.last._6 == 1)
      // intervals chain: valid_to == next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4))
          assert(a._3 != b._3, "adjacent versions must change state")
        case _ => ()
      }
    }
    // version rows collapse the same events the islands relation does
    assert(rows.length ==
      EventOps.stateIslands(spark, sf0001).count())
  }

  test("cdc diff: classification replays a driver-side snapshot compare") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"),
        dayofmonth(col("ts")).as("dom"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    def snap(p: Int) = ev.filter(_._4 % 2 == p)
      .groupBy(e => (e._1, e._2)).map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._3).sum) }
    val old = snap(0); val nw = snap(1)
    val expect = (old.keySet ++ nw.keySet).map { k =>
      k -> ((old.get(k), nw.get(k)) match {
        case (None, Some(_)) => "insert"
        case (Some(_), None) => "delete"
        case (Some(a), Some(b)) if a != b => "update"
        case _ => "unchanged"
      })
    }.toMap
    val got = EventOps.cdcSnapshotDiff(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(6)).toMap
    assert(got == expect && got.values.exists(_ == "update"))
  }

  test("resample: grid is gapless per type, counts conserved, ffill correct") {
    val rs = EventOps.resampleHourly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rs.map(_._3).sum == Tables.events(spark, sf0001).count())
    rs.groupBy(_._1).values.foreach { g =>
      val hours = g.map(_._2).sorted
      // dense: every hour between min and max present exactly once
      assert(hours.sameElements(hours.head to hours.last))
      // forward fill: after the first observed value, never null, and
      // constant across gap (n=0) hours
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          if (cur._3 == 0L) assert(cur._4 == prev._4)
        case _ => ()
      }
    }
  }

  test("equi-depth histogram: near-equal buckets, ordered disjoint bounds") {
    val rows = EventOps.equidepthHistogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._3).sum == Tables.events(spark, sf0001).count())
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1L to 10L))
      assert(g.map(_._3).max - g.map(_._3).min <= 1) // ntile balance
      g.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4) // hi(k) <= lo(k+1)
        case _ => ()
      }
    }
  }

  test("ewma replays a driver-side sequential fold") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).map { case (u, g) =>
      val xs = g.sortBy(e => (e._2, e._3)).map(_._4.toDouble)
      val e = xs.tail.foldLeft(xs.head)((acc, x) => acc + 0.3 * (x - acc))
      u -> (math.rint(e / 100.0 * 1e6) / 1e6)
    }
    val got = EventOps.ewma(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, e) =>
      assert(math.abs(got(u) - e) < 1e-9, s"user $u: ${got(u)} vs $e") }
  }

  test("anomaly z-scores replay a driver-side moment computation") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val n = g.size.toLong
      val s = g.map(_._3).sum
      val ss = g.map(e => e._3 * e._3).sum
      val sd = math.sqrt((ss.toDouble * n - s.toDouble * s) /
        (n.toDouble * (n - 1)))
      g.flatMap { case (t, id, c) =>
        val z = (c.toDouble * n - s) / (n.toDouble * sd)
        if (math.abs(z) > 2.5) Some((t, id)) else None
      }
    }.toSet
    val got = EventOps.anomalyZscore(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
    // the stats relation broadcasts (|types|-sized at any event volume)
    val plan = EventOps.anomalyZscore(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("cusum changepoint equals a driver-side exact-integer recompute") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, rows) =>
      val series = rows.sortBy(_._2).map(r => (r._2, r._3))
      val sx = series.map(_._2).sum
      val nd = series.length.toLong
      var cum = 0L
      val s = series.zipWithIndex.map { case ((day, dc), i) =>
        cum += dc
        (day, nd * cum - (i + 1).toLong * sx)
      }
      val (day, peak) = s.minBy { case (d, v) => (-math.abs(v), d) }
      t -> (day, BigDecimal(math.abs(peak).toDouble / (nd * 100.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = EventOps.cusumChangepoint(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("type transitions: rows sum to events-minus-users; rows normalize") {
    val t = EventOps.typeTransitions(spark, sf0001).cache()
    val nEvents = Tables.events(spark, sf0001).count()
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    // every event except each user's first contributes one transition
    assert(t.agg(sum(col("n"))).head.getLong(0) == nEvents - nUsers)
    // each from_type's probabilities sum to 1 (rounded)
    t.groupBy(col("from_type")).agg(sum(col("p")).as("sp")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r.toString))
    t.unpersist()
  }

  test("pattern match equals a driver-side regex over ordered sequences") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3).substring(0, 1))))
    val expect = ev.groupBy(_._1).map { case (uid, g) =>
      val seq = g.map(_._2).sortBy(e => (e._1, e._2)).map(_._3).mkString
      val conv = "v+p".r.findAllIn(seq).size.toLong
      val runs = "v+".r.findAllIn(seq).map(_.length.toLong).toSeq
      (uid, seq.length.toLong, conv,
        if (runs.isEmpty) null else runs.max.asInstanceOf[Any])
    }.toSet
    val got = EventOps.patternMatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any])).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("MAD anomalies: flags replay a driver-side robust z computation") {
    val rows = graft.operators.EventOps.anomalyMad(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, mz) => assert(math.abs(mz) > 3.5) }
    // replay one event type exactly
    val t = rows.head._1
    val cs = Tables.events(spark, sf0001)
      .filter(col("event_type") === t)
      .select(graft.functions.ExactNum.cents(col("value")))
      .collect().map(_.getLong(0)).sorted
    def med2(a: Array[Long]): Long = {
      val n = a.length
      if (n % 2 == 1) a(n / 2) * 2 else a(n / 2 - 1) + a(n / 2)
    }
    val m2 = med2(cs)
    val mad4 = med2(cs.map(c => math.abs(c * 2 - m2)).sorted)
    val expect = cs.map { c =>
      (c, 0.6745 * (c.toDouble * 2 - m2) * 2 / mad4)
    }.filter(e => math.abs(e._2) > 3.5).map(_._1).sorted
    val got = Tables.events(spark, sf0001)
      .filter(col("event_type") === t)
      .join(graft.operators.EventOps.anomalyMad(spark, sf0001)
        .filter(col("event_type") === t).select("event_id"), "event_id")
      .select(graft.functions.ExactNum.cents(col("value")))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("Holt forecast replays the driver-side level/trend recursion") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val xs = g.sortBy(_._2).map(_._3.toDouble / 100.0)
      if (xs.length < 2) None else {
        var l = xs(0); var tr = xs(1) - xs(0)
        xs.drop(1).foreach { x =>
          val l2 = 0.5 * x + 0.5 * (l + tr)
          tr = 0.5 * (l2 - l) + 0.5 * tr
          l = l2
        }
        def r6(v: Double) = BigDecimal(v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((t, xs.length.toLong, r6(l), r6(tr), r6(l + 3.0 * tr)))
      }
    }.toSet
    val got = graft.operators.EventOps.holtForecast(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("seasonal decomposition replays a driver-side MA-detrend") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val s = g.sortBy(_._2)
      (3 until s.length - 3).map { i =>
        val t7 = (i - 3 to i + 3).map(j => s(j)._3).sum
        // HALF_UP away from zero — the engines' round; math.round
        // would round negative halves toward +inf and diverge
        val det6 = BigDecimal((s(i)._3.toDouble / 100.0 -
          t7.toDouble / 700.0) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (t, s(i)._2 % 7, det6)
      }
    }.groupBy(x => (x._1, x._2)).map { case ((t, wd), ds) =>
      val sum6 = ds.map(_._3).sum
      (t, wd, ds.size.toLong,
        BigDecimal(sum6.toDouble / ds.size / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.operators.EventOps.seasonalDecompose(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
    // every cyclical slot is represented for every type with >= 13 days
    got.groupBy(_._1).foreach { case (t, rows) =>
      assert(rows.map(_._2) == (0L to 6L).toSet, s"$t missing slots")
    }
  }

  test("attribution replays a driver-side first/last-touch walk") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1).toInstant
        (r.getLong(0), t.getEpochSecond * 1000000000L + t.getNano,
          r.getLong(2), r.getString(3), r.getLong(4))
      }
    val models = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)].withDefaultValue((0L, 0L))
    evs.groupBy(_._1).foreach { case (_, g) =>
      val seq = g.sortBy(e => (e._2, e._3))
      var firstT: Option[String] = None
      var lastT: Option[String] = None
      seq.foreach { case (_, _, _, tpe, c) =>
        if (tpe == "purchase") {
          val f = firstT.getOrElse("none")
          val l = lastT.getOrElse("none")
          val (nf, rf) = models(("first_touch", f))
          models(("first_touch", f)) = (nf + 1, rf + c)
          val (nl, rl) = models(("last_touch", l))
          models(("last_touch", l)) = (nl + 1, rl + c)
        }
        if (tpe == "click" || tpe == "view") {
          if (firstT.isEmpty) firstT = Some(tpe)
          lastT = Some(tpe)
        }
      }
    }
    val got = graft.operators.EventOps.attribution(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    assert(got == models.toMap)
    // both models conserve total conversions and revenue
    val byModel = got.groupBy(_._1._1).view
      .mapValues(_.values.map(_._2).sum).toMap
    assert(byModel("first_touch") == byModel("last_touch"))
  }

  test("Theil-Sen trend replays the driver-side pairwise-slope median") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, g) =>
      val pts = g.sortBy(_._2).map(p => (p._2, p._3))
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield math.round((pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1).toDouble * 1e4)).sorted
      val n = slopes.length
      // x2 exact-interpolated median of the integer slopes
      val med2 =
        if (n % 2 == 1) 2L * slopes(n / 2)
        else slopes(n / 2 - 1) + slopes(n / 2)
      (t, pts.length.toLong, n.toLong,
        BigDecimal(med2.toDouble / 2e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.operators.EventOps.theilSenTrend(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("Markov stationary distribution: mass-conserving, fixpoint-consistent") {
    val rows = graft.operators.EventOps.markovStationary(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach(p => assert(p > 0.0 && p < 1.0))
    // row-stochastic transitions conserve total mass (mod quantization)
    assert(math.abs(rows.values.sum - 1.0) < 1e-3, s"mass ${rows.values.sum}")
    // one more application of the transition matrix barely moves it
    // (the chain mixes fast on this dense 5x5 matrix)
    val trans = graft.operators.EventOps.typeTransitions(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
      .toMap
    val next = rows.keys.map { t =>
      t -> rows.toSeq.collect { case (s, pi) if trans.contains((s, t)) =>
        pi * trans((s, t))
      }.sum
    }.toMap
    rows.foreach { case (t, pi) =>
      assert(math.abs(next(t) - pi) < 0.01, s"$t: $pi vs ${next(t)}")
    }
  }

  test("lag features: lags address the series, trailing mean is leak-free") {
    val rows = graft.operators.EventOps.lagFeatures(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1._1)
    byType.foreach { case (_, g) =>
      val days = g.keys.map(_._2).toSeq.sorted
      // the fixture calendar is contiguous per type: lag1 of day i must
      // equal y of day i-1, and lag7 y of day i-7
      days.zipWithIndex.foreach { case (d, i) =>
        val (y @ _, lag1, lag7, trail) = g((g.keys.head._1, d))
        if (i == 0) assert(lag1.isEmpty) else
          assert(lag1.contains(g((g.keys.head._1, days(i - 1)))._1), s"$d lag1")
        if (i < 7) assert(lag7.isEmpty) else
          assert(lag7.contains(g((g.keys.head._1, days(i - 7)))._1), s"$d lag7")
        // leak-free: the trailing mean never includes the current y —
        // recompute it from the previous <=7 days' targets
        if (i == 0) assert(trail.isEmpty) else {
          val prev = days.slice(math.max(0, i - 7), i)
            .map(dd => g((g.keys.head._1, dd))._1)
          val expect = BigDecimal(prev.map(v => math.round(v * 100)).sum
            .toDouble / prev.length / 100.0)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(trail.contains(expect), s"$d trail: $trail vs $expect")
        }
      }
    }
  }

  test("Markov stationary: sink types self-loop, mass conserved") {
    import spark.implicits._
    // a -> b -> c with c TERMINAL (only ever a destination): without
    // the self-loop closure c would absorb mass one round and leak it
    // the next, so the output would not sum to 1 (r6 advice item)
    val counts = Seq(("a", "b", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "n")
    val pi = graft.operators.EventOps.markovStationaryOf(counts, iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(pi.keySet == Set("a", "b", "c"), pi.toString)
    assert(math.abs(pi.values.sum - 1.0) < 1e-6, s"mass ${pi.values.sum}")
    // after 3 rounds from uniform 1/3: all mass has drained into the
    // absorbing sink c
    assert(pi("c") > 0.999, pi.toString)
  }

  test("Nelson-Aalen hazard: consistent with KM risk sets, near -ln(S)") {
    val na = graft.operators.EventOps.nelsonAalen(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val km = graft.operators.EventOps.kaplanMeier(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(na.nonEmpty)
    // identical (lifetime, risk set, churn) triples
    assert(na.map(t => (t._1, t._2, t._3)).toSeq ==
      km.map(t => (t._1, t._2, t._3)).toSeq)
    // cumulative hazard is strictly increasing
    na.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b > a)
      case _ => ()
    }
    // classical bound: H(t) <= -ln(S(t)) (sum of d/n vs -sum ln(1-d/n))
    na.zip(km).foreach { case ((_, _, _, h), (_, _, _, s)) =>
      if (s > 0.0)
        assert(h <= -math.log(s) + 1e-6,
          s"H=$h exceeds -ln(S)=${-math.log(s)}")
    }
    // driver-side replay of the quantized prefix sums
    var cum = 0L
    na.foreach { case (_, n, d, h) =>
      cum += BigDecimal(d.toDouble / n.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val expect = BigDecimal(cum / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(h == expect, s"$h vs $expect")
    }
  }

  test("Kaplan-Meier replays a driver-side product-limit estimate") {
    val lives = Tables.events(spark, sf0001)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg((max(col("day")) - min(col("day"))).as("lt"))
      .collect().map(_.getLong(1))
    val hist = lives.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var atRisk = lives.length.toLong
    var s = 1.0
    val expect = hist.map { case (lt, d) =>
      s = s * ((atRisk - d).toDouble / atRisk.toDouble)
      val row = (lt, atRisk, d,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      atRisk -= d
      row
    }.toSet
    val got = graft.operators.EventOps.kaplanMeier(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
    // survival is monotone non-increasing from ~1 toward its floor
    val byT = got.toSeq.sortBy(_._1).map(_._4)
    byT.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ => ()
    }
    assert(byT.last >= 0.0 && byT.head <= 1.0)
  }

  test("rolling median replays a driver-side windowed x2 median") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val s = g.sortBy(_._2)
      (3 until s.length - 3).map { i =>
        val w = (i - 3 to i + 3).map(j => s(j)._3).sorted
        (t, s(i)._2, s(i)._3, 2L * w(3)) // odd window: med2 = 2*mid
      }
    }.toSet
    val got = graft.operators.EventOps.rollingMedian(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("forecast backtest replays the driver-side three-model recursion") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def e6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = daily.groupBy(_._1).flatMap { case (ty, g) =>
      val xs = g.sortBy(_._2).map(_._3.toDouble / 100.0)
      if (xs.length < 14) Nil else {
        val nD = xs.length
        var l = xs(0); var t = xs(1) - xs(0)
        var e = xs(0); var prev = xs(0)
        var sn = 0L; var se = 0L; var sh = 0L
        (2 to nD).foreach { j =>
          val x = xs(j - 1)
          if (j >= nD - 6) {
            sn += e6(math.abs(x - prev))
            se += e6(math.abs(x - e))
            sh += e6(math.abs(x - (l + t)))
          }
          val l2c = 0.5 * x + 0.5 * (l + t)
          t = 0.5 * (l2c - l) + 0.5 * t
          l = l2c
          e = e + 0.5 * (x - e)
          prev = x
        }
        def r6(s: Long) = BigDecimal(s.toDouble / 7.0 / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Seq((ty, "naive", 7L, r6(sn)), (ty, "ewma", 7L, r6(se)),
          (ty, "holt", 7L, r6(sh)))
      }
    }.toSet
    val got = graft.operators.EventOps.forecastBacktest(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("Holt-Winters replays the driver-side seasonal-ring recursion") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = 7
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val cs = g.sortBy(_._2).map(_._3)
      if (cs.length < 2 * m) None else {
        val xs = cs.map(_.toDouble / 100.0)
        var l = cs.take(m).sum.toDouble / 100.0 / m
        var b = (cs.slice(m, 2 * m).sum - cs.take(m).sum).toDouble /
          100.0 / (m * m)
        var s = cs.take(m).map(c => c.toDouble / 100.0 - l).toVector
        xs.drop(m).foreach { x =>
          val s1 = s.head
          val l2 = 0.5 * (x - s1) + 0.5 * (l + b)
          val b2 = 0.5 * (l2 - l) + 0.5 * b
          val sn = 0.5 * (x - l2) + 0.5 * s1
          l = l2; b = b2; s = s.tail :+ sn
        }
        def r6(v: Double) = BigDecimal(v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((t, cs.length.toLong, r6(l), r6(b), r6(l + 3.0 * b + s(2))))
      }
    }.toSet
    val got = graft.operators.EventOps.holtWintersForecast(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("autocorrelation replays a driver-side exact-moment computation") {
    val daily = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        graft.functions.ExactNum.cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("dc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val xs = g.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val sTot = xs.sum
      val d = xs.map(x => BigInt(n * x - sTot))
      val den = d.map(v => v * v).sum
      (1 to 7).flatMap { k =>
        if (n <= k) None else {
          val num = (0 until (xs.length - k)).map(i => d(i) * d(i + k)).sum
          Some((t, k.toLong, n,
            BigDecimal(BigDecimal(num).toDouble / BigDecimal(den).toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
    }.toSet
    val got = graft.operators.EventOps.autocorrelation(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty)
    assert(got == expect)
    // lag-0 sanity equivalent: every |acf| <= 1 + rounding slack
    got.foreach { case (_, _, _, acf) => assert(math.abs(acf) <= 1.000001) }
  }

  test("markov holdout accuracy replays driver-side") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val s = es.sortBy(e => (e._3, e._4))
      s.sliding(2).collect { case Array(a, b) => (u, a._2, b._2) }
    }
    val tr = pairs.filter(_._1 % 5 != 4)
    val te = pairs.filter(_._1 % 5 == 4)
    val model = tr.groupBy(p => (p._2, p._3)).view.mapValues(_.size).toSeq
      .groupBy(_._1._1).map { case (prev, g) =>
        prev -> g.minBy { case ((_, nxt), n) => (-n, nxt) }._1._2 }
    val basePred = tr.groupBy(_._3).view.mapValues(_.size).toSeq
      .minBy { case (nxt, n) => (-n, nxt) }._1
    val expect = te.filter(p => model.contains(p._2))
      .groupBy(p => (p._2, model(p._2))).map { case ((prev, pred), g) =>
        val n = g.size.toLong
        val c = g.count(_._3 == pred).toLong
        val b = g.count(_._3 == basePred).toLong
        (prev, pred) -> (n, c, c * 1000 / n, b * 1000 / n)
      }
    val got = graft.operators.EventOps.markovHoldoutAccuracy(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"holdout diverges: $got vs $expect")
    assert(got.nonEmpty)
  }

  test("dau/wau/mau replay driver-side; nesting invariant holds") {
    val act = Tables.events(spark, sf0001)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = act.map(_._2).distinct
    val expect = days.map { day =>
      val dau = act.filter(_._2 == day).map(_._1).distinct.length.toLong
      val wau = act.filter(a => a._2 <= day && day - a._2 <= 6)
        .map(_._1).distinct.length.toLong
      val mau = act.filter(a => a._2 <= day && day - a._2 <= 29)
        .map(_._1).distinct.length.toLong
      day -> (dau, wau, mau, dau * 1000 / mau)
    }.toMap
    val got = graft.operators.EventOps.dauWauMau(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == expect, s"engagement diverges: ${got.size} vs ${expect.size}")
    got.values.foreach { case (dau, wau, mau, _) =>
      assert(dau <= wau && wau <= mau, "active sets must nest") }
  }

  test("srm check and mde replay driver-side on the fixture") {
    val users = Tables.events(spark, sf0001)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val nt = users.count(_ % 2 == 1).toLong
    val nc = users.count(_ % 2 == 0).toLong
    val e = (nt + nc).toDouble / 2.0
    val chi2 = (nt - e) * (nt - e) / e + (nc - e) * (nc - e) / e
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srm = graft.operators.EventOps.srmCheck(spark, sf0001).collect()(0)
    assert(srm.getLong(0) == nt && srm.getLong(1) == nc)
    assert(srm.getDouble(2) == r6(chi2))
    assert(srm.getInt(3) == (if (chi2 > 3.841) 1 else 0))
    // mde: replay the pooled-variance chain
    val post = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("epday"))
      .collect().filter(_.getLong(2) >= 19738L)
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => math.round(r.getDouble(1) * 100)).sum }
    val ys = users.map(u => post.getOrElse(u, 0L))
    val n = ys.length.toDouble
    val sy = ys.sum; val syy = ys.map(y => BigInt(y) * y).sum
    val varY = (syy.toDouble - sy.toDouble * sy / n) / n
    val se = math.sqrt(varY / nt + varY / nc) / 100.0
    val syc = users.filter(_ % 2 == 0).map(u => post.getOrElse(u, 0L)).sum
    val meanC = syc.toDouble / nc / 100.0
    val mde = graft.operators.EventOps.mdeEstimate(spark, sf0001).collect()(0)
    assert(mde.getLong(0) == nt && mde.getLong(1) == nc)
    assert(mde.getDouble(2) == r6(se), s"se ${mde.getDouble(2)} vs $se")
    assert(mde.getDouble(3) == r6(2.8 * se))
    assert(mde.getLong(4) == math.round(2.8 * se * 1000.0 / meanC))
    assert(mde.getDouble(3) > 0.0)
  }

  test("msprt monitor replays driver-side; p is monotone non-increasing") {
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("epday"))
      .collect()
      .map(r => (r.getLong(0) % 2 == 1, math.round(r.getDouble(1) * 100),
        r.getLong(2)))
    val days = ev.map(_._3).distinct.sorted
    var (cnt, cst, cnc, csc) = (0L, 0L, 0L, 0L)
    var (cqt, cqc) = (BigInt(0), BigInt(0))
    var pMin = Double.MaxValue
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = days.flatMap { d =>
      val rows = ev.filter(_._3 == d)
      val t = rows.filter(_._1); val c = rows.filterNot(_._1)
      cnt += t.length; cst += t.map(_._2).sum
      cqt += t.map(x => BigInt(x._2) * x._2).sum
      cnc += c.length; csc += c.map(_._2).sum
      cqc += c.map(x => BigInt(x._2) * x._2).sum
      if (cnt <= 1 || cnc <= 1) None
      else {
        val eff = cst.toDouble / cnt / 100.0 - csc.toDouble / cnc / 100.0
        val v = (cqt.toDouble / 10000.0 -
          (cst.toDouble / 100.0) * (cst.toDouble / 100.0) / cnt) / cnt /
          cnt.toDouble +
          (cqc.toDouble / 10000.0 -
          (csc.toDouble / 100.0) * (csc.toDouble / 100.0) / cnc) / cnc /
          cnc.toDouble
        val lam = math.sqrt(v / (v + 100.0)) *
          math.exp(eff * eff * 100.0 / (2.0 * v * (v + 100.0)))
        pMin = math.min(pMin, math.min(1.0, 1.0 / lam))
        Some((d, cnt, cnc, r6(eff), r6(lam), r6(pMin)))
      }
    }.toSet
    val got = graft.operators.EventOps.msprtMonitor(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expect, s"monitor diverges: ${got.size} vs ${expect.size}")
    // always-valid property: p never increases as days accumulate
    val ps = got.toSeq.sortBy(_._1).map(_._6)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a })
    assert(got.nonEmpty)
  }

  test("did lift replays driver-side; interval brackets the estimate") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("value"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("epday"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val users = ev.map(_._1).distinct
    val ds = users.map { u =>
      val p = ev.filter(e => e._1 == u && e._2 == "purchase")
      val x = p.filter(_._4 < 19738L).map(e => math.round(e._3 * 100)).sum
      val y = p.filter(_._4 >= 19738L).map(e => math.round(e._3 * 100)).sum
      (u % 2, y - x)
    }
    def arm(a: Long) = {
      val g = ds.filter(_._1 == a).map(_._2)
      val n = g.length.toDouble
      val sd = g.sum; val sdd = g.map(d => BigInt(d) * d).sum
      (g.length.toLong, sd.toDouble / n,
        (sdd.toDouble - sd.toDouble * sd.toDouble / n) / n)
    }
    val (nt, mt, vt) = arm(1); val (nc, mc, vc) = arm(0)
    val did = (mt - mc) / 100.0
    val se = math.sqrt(vt / nt + vc / nc) / 100.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.operators.EventOps.didLift(spark, sf0001).collect()(0)
    assert(got.getLong(0) == nt && got.getLong(1) == nc)
    assert(got.getDouble(2) == r6(did), s"did ${got.getDouble(2)} vs $did")
    assert(got.getDouble(3) == r6(se), "se")
    assert(got.getDouble(4) == r6(did - 1.96 * se), "lo95")
    assert(got.getDouble(5) == r6(did + 1.96 * se), "hi95")
    assert(got.getDouble(4) < got.getDouble(2) &&
      got.getDouble(2) < got.getDouble(5))
  }

  test("cuped lift replays driver-side; adjustment is mean-preserving") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("value"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("epday"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val users = ev.map(_._1).distinct.sorted
    val xy = users.map { u =>
      val p = ev.filter(e => e._1 == u && e._2 == "purchase")
      val x = p.filter(_._4 < 19738L).map(e => math.round(e._3 * 100)).sum
      val y = p.filter(_._4 >= 19738L).map(e => math.round(e._3 * 100)).sum
      (u, u % 2, x, y)
    }
    val n = xy.length.toDouble
    val sx = xy.map(_._3).sum; val sy = xy.map(_._4).sum
    val sxy = xy.map(t => t._3 * t._4).sum
    val sxx = xy.map(t => t._3 * t._3).sum
    val syy = xy.map(t => t._4 * t._4).sum
    val theta = (n * sxy - sx.toDouble * sy) / (n * sxx - sx.toDouble * sx)
    val num = n * sxy - sx.toDouble * sy
    val rho2 = num * num /
      ((n * sxx - sx.toDouble * sx) * (n * syy - sy.toDouble * sy))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = xy.groupBy(_._2).map { case (arm, g) =>
      val na = g.length
      val mx = g.map(_._3).sum.toDouble / na / 100.0
      val my = g.map(_._4).sum.toDouble / na / 100.0
      arm -> (na.toLong, r6(mx), r6(my),
        r6(my - theta * (mx - sx.toDouble / n / 100.0)), r6(theta),
        math.round(rho2 * 1000.0))
    }
    val got = graft.operators.EventOps.cupedLift(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    assert(got == expect, s"cuped diverges:\n$got\nvs\n$expect")
    // sanity: rho^2 in [0, 1000], both arms populated
    got.values.foreach { case (_, _, _, _, _, vr) =>
      assert(vr >= 0L && vr <= 1000L) }
    assert(got.size == 2)
  }

  test("sequence support equals a driver-side existential pair scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val byUser = ev.groupBy(_._1)
    val expect = (for {
      ta <- types; tb <- types
      n = users.count { u =>
        val es = byUser(u)
        es.exists { case (_, t1, ts1) => t1 == ta &&
          es.exists { case (_, t2, ts2) => t2 == tb && ts1 < ts2 } }
      } if n > 0
    } yield (ta, tb) -> (n.toLong, n.toLong * 1000 / users.length)).toMap
    val got = graft.operators.EventOps.sequenceSupport(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"support diverges: ${got.size} vs ${expect.size}")
    assert(got.nonEmpty)
  }
}
