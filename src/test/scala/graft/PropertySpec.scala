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

  test("IVF kernels: distance range, argmin-first-tie, sorted probes") {
    import graft.knn.IvfKnn
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0)).map(_.toArray)
    val vecs = for {
      n <- Gen.chooseNum(1, 6)
      d <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0)).map(_.toArray))
    } yield cs.toArray
    // range is [-eps, 1]: sim can exceed 1 by an ulp (dot==sa==sb but
    // sqrt(sa)*sqrt(sa) != sa exactly); the reference clamps only at 0
    // (vector.rs:14-21) and the DuckDB oracle computes the identical
    // double, so the ulp never diverges between engines
    check("cosDist range + self-distance", Prop.forAll(vec) { v =>
      val d = IvfKnn.cosDist(v, v)
      d >= -1e-12 && d <= 1.0 + 1e-12 && (v.forall(_ == 0.0) || math.abs(d) < 1e-9)
    })
    check("nearestCid is the scan argmin with first-index ties",
      Prop.forAll(vecs, vec) { (cs, v) =>
        val dists = cs.map(c => IvfKnn.cosDist(c, v))
        IvfKnn.nearestCid(cs, v) == dists.indexOf(dists.min)
      })
    check("probeCids: sorted by (dist, cid), bounded, distinct",
      Prop.forAll(vecs, vec, Gen.chooseNum(1, 8)) { (cs, v, np) =>
        val ps = IvfKnn.probeCids(cs, v, np)
        val scored = ps.map(c => (IvfKnn.cosDist(cs(c), v), c))
        ps.length == math.min(np, cs.length) &&
          ps.distinct.length == ps.length &&
          scored.sliding(2).forall(w =>
            w.length < 2 || Ordering[(Double, Int)].lteq(w(0), w(1)))
      })
  }

  test("projection matrix: seed-deterministic, correctly shaped") {
    import graft.knn.RandomProjection
    check("matrix determinism",
      Prop.forAll(Gen.chooseNum(1, 64), Gen.chooseNum(1, 32), Gen.long) {
        (dim, out, seed) =>
          val a = RandomProjection.projectionMatrix(dim, out, seed)
          val b = RandomProjection.projectionMatrix(dim, out, seed)
          a.length == out && a.forall(_.length == dim) &&
            a.zip(b).forall { case (x, y) => x.sameElements(y) }
      }, n = 25)
  }
}
