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
}
