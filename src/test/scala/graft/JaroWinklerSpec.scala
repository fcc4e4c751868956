package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerImpl
import graft.operators.TextOps

class JaroWinklerSpec extends SparkSpec {

  // expected values verified against DuckDB 1.0's
  // jaro_winkler_similarity (the oracle engine) — both boosted and
  // unboosted regimes, the 4-char prefix cap, and the zero cases
  private val known = Seq(
    ("martha", "marhta", 0.9611111111111111),   // boost, prefix 3
    ("dwayne", "duane", 0.8400000000000001),    // boost, prefix 1
    ("dixon", "dicksonx", 0.8133333333333332),  // boost, prefix 2
    ("abcdef", "abwxyz", 0.5555555555555555),   // jaro <= 0.7: no boost
    ("crate", "trace", 0.7333333333333334),     // jaro > 0.7, prefix 0
    ("prefixaa", "prefixzz", 0.9),              // prefix capped at 4
    ("aaaaa", "aaaab", 0.92),                   // lands exactly on 0.92
    ("xy", "yx", 0.0),                          // window 0: no matches
    ("a", "b", 0.0),
    ("ab", "", 0.0))

  test("jaro-winkler matches the DuckDB oracle on pinned pairs") {
    known.foreach { case (a, b, want) =>
      val got = JaroWinklerImpl.similarity(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): $got != $want")
    }
  }

  test("symmetric and bounded on random-ish vocabulary pairs") {
    val words = Seq("shipping", "shiping", "priority", "prioirty",
      "economy", "econmy", "machinery", "machine", "household", "house")
    for (a <- words; b <- words) {
      val ab = JaroWinklerImpl.similarity(a, b)
      val ba = JaroWinklerImpl.similarity(b, a)
      assert(ab == ba, s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0, s"out of bounds on ($a, $b): $ab")
      if (a == b) assert(ab == 1.0)
    }
  }

  test("codegen, interpreted eval, and SQL registration agree") {
    import spark.implicits._
    graft.plans.GraftExtensions.install(spark)
    val df = known.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    // whole-stage codegen path (projection over a local relation)
    val viaSql = df.selectExpr("a", "b", "graft_jaro_winkler(a, b) AS jw")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    viaSql.foreach { case (a, b, jw) =>
      assert(jw == JaroWinklerImpl.similarity(a, b),
        s"codegen/eval mismatch on ($a, $b)")
    }
    // null propagation
    val n = spark.sql(
      "SELECT graft_jaro_winkler(CAST(NULL AS STRING), 'x')").head()
    assert(n.isNullAt(0))
  }

  test("declared linkage query: blocked, thresholded, value-correct") {
    val r = TextOps.jaroWinklerPairs(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w1, w2, jw) =
        (row.getString(0), row.getString(1), row.getDouble(2))
      assert(w1 < w2)
      assert(w1.take(2) == w2.take(2), s"block violated: ($w1, $w2)")
      assert(jw >= 0.92)
      val direct = JaroWinklerImpl.similarity(w1, w2)
      assert(math.abs(jw - direct) < 5e-7, s"($w1, $w2): $jw vs $direct")
    }
  }
}
