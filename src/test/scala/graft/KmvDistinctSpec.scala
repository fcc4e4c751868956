package graft

import graft.functions.KmvDistinct
import graft.operators.TextOps

class KmvDistinctSpec extends SparkSpec {

  test("exact below k, estimate within 15% above k, merge == reduce") {
    val kmv = KmvDistinct(k = 64, p = 1000000007L)
    val rnd = new scala.util.Random(4)
    // below k: exact
    val small = Seq.fill(40)(math.abs(rnd.nextLong()) % 1000000007L).distinct
    val bSmall = small.foldLeft(kmv.zero)(kmv.reduce)
    assert(kmv.finish(bSmall) == small.size.toDouble)
    // above k: within 15% for uniform hashes
    val big = (1 to 20000).map(_ => math.abs(rnd.nextLong()) % 1000000007L).distinct
    val bBig = big.foldLeft(kmv.zero)(kmv.reduce)
    val est = kmv.finish(bBig)
    assert(math.abs(est - big.size) / big.size < 0.15, s"est=$est exact=${big.size}")
    // merge of split halves equals single-pass reduce
    val (h1, h2) = big.splitAt(big.size / 2)
    val merged = kmv.merge(h1.foldLeft(kmv.zero)(kmv.reduce),
      h2.foldLeft(kmv.zero)(kmv.reduce))
    assert(kmv.finish(merged) == est)
  }

  test("declared sketch query: estimate tracks the exact distinct count") {
    val row = TextOps.sketchDistinctNgrams(spark, sf0001).collect()(0)
    val est = row.getDouble(0)
    val exact = row.getLong(1)
    assert(exact > 256, "fixture should be in the estimation regime")
    assert(math.abs(est - exact) / exact < 0.2, s"est=$est exact=$exact")
  }

  test("KmvSketch set algebra: overlap estimator tracks planted " +
      "intersections and is exact below k") {
    val k = 128
    val agg = graft.functions.KmvSketch(k)
    val rnd = new scala.util.Random(11)
    def draw(n: Int): Array[Long] = {
      val s = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (s.size < n) s += math.abs(rnd.nextLong()) % 1000000007L
      s.toArray
    }
    def estimateOverlap(ka: Array[Long], kb: Array[Long]): Double = {
      val l = agg.merge(ka, kb)
      val (inA, inB) = (ka.toSet, kb.toSet)
      val m = l.count(h => inA(h) && inB(h))
      m.toDouble / l.length * agg.estimate(l)
    }
    // estimation regime: |A|=|B|=5000 sharing a planted 2000
    val shared = draw(2000)
    val a = shared ++ draw(3000)
    val b = shared ++ draw(3000)
    val (ka, kb) = (a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val est = estimateOverlap(ka, kb)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.35, s"est=$est exact=2000")
    // merge path == single-pass path (mergeable-sketch contract)
    val (a1, a2) = a.splitAt(a.length / 2)
    val kaMerged = agg.merge(a1.foldLeft(agg.zero)(agg.reduce),
      a2.foldLeft(agg.zero)(agg.reduce))
    assert(java.util.Arrays.equals(kaMerged, ka))
    // exact regime: below k the sketches ARE the sets, so the
    // estimator returns the true intersection size exactly
    val smallA = draw(40)
    val smallB = smallA.take(15) ++ draw(25) // 15 shared, 25 fresh
    val kA = smallA.foldLeft(agg.zero)(agg.reduce)
    val kB = smallB.foldLeft(agg.zero)(agg.reduce)
    val trueOverlap = smallA.toSet.intersect(smallB.toSet).size
    assert(estimateOverlap(kA, kB) == trueOverlap.toDouble)
  }

  test("declared overlap query: estimates track exact pair overlaps") {
    val rows = TextOps.kmvSourceOverlap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getLong(4))
      val jac = r.getDouble(2)
      assert(jac >= 0.0 && jac <= 1.0)
      if (exact >= 100)
        assert(math.abs(est - exact) / exact < 0.35,
          s"${r.getString(0)}x${r.getString(1)}: est=$est exact=$exact")
    }
  }
}
