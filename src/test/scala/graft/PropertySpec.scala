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

  test("word n-grams generator: count/shape laws vs a sliding reference") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.oneOf("alpha", "b", "cc", "ddd", "")
    val texts = Gen.listOf(word).map(_.mkString(" "))
    check("ngrams", Prop.forAll(texts, Gen.chooseNum(1, 4)) { (text, n) =>
      val g = graft.functions.WordNgrams(
        BoundReference(0, StringType, nullable = true),
        Literal(n))
      val rows = g.eval(InternalRow(UTF8String.fromString(text)))
        .iterator.toSeq.map(r =>
          (r.getInt(0), r.getUTF8String(1).toString))
      val words = text.split(" ")
      val expect = if (words.length < n) Seq.empty
        else words.sliding(n).zipWithIndex
          .map { case (w, i) => (i + 1, w.mkString(" ")) }.toSeq
      rows == expect
    })
  }

  test("binary quantization: hamming(a,a)=0; popcount equals bit diff") {
    val vec = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    check("bq-selfzero", Prop.forAll(vec, vec) { (a, b) =>
      def code(v: Array[Double]): Long = {
        var c = 0L; var i = 0
        while (i < math.min(64, v.length)) {
          if (v(i) > 0.0) c |= (1L << i); i += 1 }
        c
      }
      val (ca, cb) = (code(a), code(b))
      val ham = java.lang.Long.bitCount(ca ^ cb)
      val ref = (0 until 64).count(i => (a(i) > 0.0) != (b(i) > 0.0))
      java.lang.Long.bitCount(ca ^ ca) == 0 && ham == ref
    }, n = 25)
  }

  test("deletion neighborhood is a lossless ed-join blocker (d<=2)") {
    def dels(w: String, d: Int): Set[String] = {
      var seen = Set(w)
      var frontier = Set(w)
      (1 to d).foreach { _ =>
        frontier = frontier.flatMap(s =>
          (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1)))
        seen ++= frontier
      }
      seen
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val word = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    check("fastss", Prop.forAll(word, word) { (a, b) =>
      // if within distance 2, the deletion neighborhoods must intersect
      lev(a, b) > 2 || (dels(a, 2) & dels(b, 2)).nonEmpty
    })
  }
}
