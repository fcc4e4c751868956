package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.KmvDistinct
import graft.knn.HnswIndex
import graft.operators.Dedup

/** Property-based laws for the pure JVM kernels (raw ScalaCheck — the
  * scalatest bridge isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("gramsOf: gram count and shape laws") {
    val words = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    check("grams", Prop.forAll(words) { ws =>
      val text = ws.mkString(" ")
      val grams = Dedup.gramsOf(text)
      val n = text.split(" ", -1).length
      grams.size <= math.max(0, n - 2) &&
        grams.forall(_.split(" ", -1).length == 3) &&
        grams.distinct == grams
    })
  }

  test("KMV: exact below k; merge is order-insensitive") {
    val kmv = KmvDistinct(k = 32)
    val hashes = Gen.listOf(Gen.choose(0L, 1000000006L))
    check("kmv-exact", Prop.forAll(hashes) { hs =>
      val distinct = hs.distinct
      val b = hs.foldLeft(kmv.zero)(kmv.reduce)
      if (distinct.size < 32) kmv.finish(b) == distinct.size.toDouble
      else b.length == 32
    })
    check("kmv-merge", Prop.forAll(hashes, hashes) { (h1, h2) =>
      val a = h1.foldLeft(kmv.zero)(kmv.reduce)
      val b = h2.foldLeft(kmv.zero)(kmv.reduce)
      kmv.finish(kmv.merge(a, b)) == kmv.finish(kmv.merge(b, a)) &&
        kmv.finish(kmv.merge(a, b)) ==
          kmv.finish((h1 ++ h2).foldLeft(kmv.zero)(kmv.reduce))
    })
  }

  test("HnswIndex: search bounds and self-retrieval on arbitrary data") {
    val vec = Gen.listOfN(4, Gen.choose(-5.0, 5.0)).map(_.toArray)
      .suchThat(v => v.exists(_ != 0.0))
    val pts = Gen.listOfN(30, vec)
    check("hnsw", Prop.forAll(pts, Gen.choose(0L, 999L)) { (vs, seed) =>
      val idx = new HnswIndex(seed = seed)
      vs.zipWithIndex.foreach { case (v, i) => idx.insert(i.toLong, v) }
      val res = idx.search(vs.head, 5)
      res.length == math.min(5, vs.length) &&
        res.forall { case (_, d) => d >= 0.0 && d <= 1.0 } &&
        res.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)) &&
        res.head._2 < 1e-9 // the queried point itself is distance ~0
    }, n = 25)
  }

  test("fnv64/simhash: equal token sequences hash equally, stable across runs") {
    val tokens = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check("simhash", Prop.forAll(tokens) { ts =>
      Dedup.simhash64(ts) == Dedup.simhash64(ts.map(identity))
    })
  }
}
