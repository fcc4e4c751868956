package graft

import org.apache.spark.sql.functions._

import graft.operators.Governance

class GovernanceSpec extends SparkSpec {

  test("k-anonymity audit replays a driver-side group census") {
    val rows = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_mktsegment", "n_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sizes = rows.groupBy(identity).values.map(_.length.toLong).toSeq
    val below = sizes.filter(_ < 10)
    val row = Governance.kAnonymity(spark, sf0001).head()
    assert(row.getLong(0) == rows.length)
    assert(row.getLong(1) == sizes.length)
    assert(row.getLong(2) == sizes.min)
    assert(row.getLong(3) == below.length)
    assert(row.getLong(4) == below.sum)
    assert(row.getLong(5) == below.sum * 1000 / rows.length)
    // the tiny fixture MUST have re-identifiable groups — the audit is
    // not vacuously green
    assert(row.getLong(3) > 0, "expected sub-k groups at sf0.001")
  }

  test("dp counts replay the poly-hash Laplace mechanism exactly") {
    val truth = Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, ch) => Math.floorMod(acc * 31 + ch.toInt, P))
    val got = Governance.dpEventCounts(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == truth.size)
    got.foreach { case (t, n, eps, noisy) =>
      assert(n == truth(t))
      assert(eps == 1.0)
      val u = (polyHash(t + ":dp1").toDouble + 1.0) / 1000000009.0
      val noise = -1.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val expect = BigDecimal(n.toDouble + noise)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(noisy == expect, s"$t: $noisy vs $expect")
      // sensitivity-1 Laplace(1) noise is almost surely small here —
      // the release must stay recognizably near the truth
      assert(math.abs(noisy - n) < 25.0, s"$t noise ${noisy - n}")
    }
  }

  test("l-diversity: cell-consistent, homogeneity flags exactly l<2") {
    val rows = Governance.lDiversity(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    // class sizes tile the joined customer table exactly once
    val total = Tables.customer(spark, sf0001).count()
    assert(rows.map(_._3).sum == total)
    rows.foreach { case (seg, nat, sz, l, share, homog) =>
      assert(l >= 1 && l <= 3, s"$seg/$nat l=$l") // 3 sensitive bands
      assert(l <= sz)
      // dominant share is at least the uniform share and at most 1000
      assert(share >= 1000 / l - 1 && share <= 1000,
        s"$seg/$nat share=$share l=$l")
      assert((homog == 1) == (l < 2), s"$seg/$nat homogeneous=$homog l=$l")
    }
  }

  test("t-closeness replays a driver-side ordered-attribute EMD") {
    val base = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_mktsegment", "n_name", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.getDouble(2) < 0) 0 else if (r.getDouble(2) < 5000) 1 else 2))
    val n = base.length.toLong
    val t1 = base.count(_._3 <= 0).toLong
    val t2 = base.count(_._3 <= 1).toLong
    val got = Governance.tCloseness(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val classes = base.groupBy(t => (t._1, t._2))
    assert(got.size == classes.size)
    classes.foreach { case (k, members) =>
      val sz = members.length.toLong
      val c1 = members.count(_._3 <= 0).toLong
      val c2 = members.count(_._3 <= 1).toLong
      val want = (BigInt((c1 * n - t1 * sz).abs) + BigInt((c2 * n - t2 * sz).abs)) *
        1000 / (2 * BigInt(sz) * n)
      val (szGot, t) = got(k)
      assert(szGot == sz)
      assert(t == want.toLong, s"$k: t=$t want=$want")
      assert(t >= 0 && t <= 1000)
    }
    // the fixture must exercise a non-trivial spread — not vacuously 0
    assert(got.values.map(_._2).max > 0, "expected a nonzero EMD class")
  }

  test("pseudonymization: deterministic keyed tokens, injective on the " +
      "fixture, top-3 cut replays") {
    val rows = graft.operators.Governance.pseudonymizeUsers(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // exactly perType rows per event type; injectivity audit holds
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.length == 3, s"$t should emit 3 rows")
      assert(rs.head._5 == rs.head._6, s"$t token collision: ${rs.head}")
    }
    // the token is the declared keyed sha256, reproducible driver-side
    rows.foreach { case (_, uid, tok16, _, _, _) =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"graft-pseu-k1:$uid"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      assert(tok16 == hex.take(16), s"user $uid token mismatch")
    }
    // driver replay of the (n_events desc, user_id) cut
    val counts = Tables.events(spark, sf0001)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).map(r => (t, r._2, r._3)).toSeq
    }.toSet
    assert(rows.map(r => (r._1, r._2, r._4)).toSet == expect)
  }
}
