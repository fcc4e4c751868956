package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingStats

class EmbeddingStatsSpec extends SparkSpec {

  test("isotropy matches a driver-side quantized recomputation") {
    val q = 1000000L
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
      .map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val mag = math.sqrt(s)
        if (mag == 0.0) v else v.map(_ / mag)
      }
    val n = vecs.length
    val dims = vecs.head.length
    val qsums = new Array[Long](dims)
    vecs.foreach { v =>
      var d = 0
      while (d < dims) {
        qsums(d) += math.round(v(d) * q)
        d += 1
      }
    }
    val t2 = qsums.map { s =>
      val m = s.toDouble / (n.toLong * q)
      math.round(m * m * 1e12)
    }.sum
    val mn = math.sqrt(t2.toDouble / 1e12)
    val row = EmbeddingStats.isotropy(spark, sf0001).collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == n.toLong)
    assert(row.head.getDouble(1) ==
      BigDecimal(mn).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val iso = row.head.getDouble(2)
    assert(iso >= 0.0 && iso <= 1.0)
    // a random-ish unit cloud must not be fully collinear
    assert(row.head.getDouble(1) < 0.9, s"mean_norm=${row.head.getDouble(1)}")
  }

  test("centroid distances match a driver-side quantized recomputation") {
    val q = 1000000L
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val dims = rows.head._2.length
    val cents = rows.groupBy(_._1).map { case (lbl, g) =>
      lbl -> Array.tabulate(dims) { d =>
        // quantize-then-sum: exact integer arithmetic, like the query
        val s = g.map(r => math.round(r._2(d) * q)).sum
        s.toDouble / (g.length * q)
      }
    }
    val labels = cents.keys.toSeq.sorted
    val expect = (for {
      a <- labels; b <- labels if a < b
    } yield {
      val d = math.sqrt((0 until dims).map { i =>
        val x = cents(a)(i) - cents(b)(i); x * x
      }.sum)
      (a, b) -> BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }).toMap
    val got = EmbeddingStats.centroidDistances(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expect(k)) < 1e-9, s"$k: $v vs ${expect(k)}")
    }
    // separation sanity: all distances strictly positive
    assert(got.values.forall(_ > 0))
  }

  test("outlier top-k equals a driver-side centroid-distance ranking") {
    val q = 1000000L
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val dims = rows.head._3.length
    val cents = rows.groupBy(_._2).map { case (lbl, g) =>
      lbl -> Array.tabulate(dims) { d =>
        g.map(r => math.round(r._3(d) * q)).sum.toDouble / (g.length * q)
      }
    }
    val expect = rows.map { case (id, lbl, v) =>
      val c = cents(lbl)
      val dist = math.sqrt((0 until dims).map { i =>
        val x = v(i) - c(i); x * x
      }.sum)
      (id, lbl, BigDecimal(dist).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(e => (-e._3, e._1)).take(20)
      .zipWithIndex.map { case ((id, l, d), i) => (id, l, d, i + 1) }.toSeq
    val got = EmbeddingStats.outlierTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._4).toSeq
    assert(got == expect && got.nonEmpty)
    // the global heap runs two-phase (map-side prune feeds one reducer)
    val plan = EmbeddingStats.outlierTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
  }

  test("jacobi eigensolver recovers known spectra") {
    // diagonal matrix: eigenvalues are the diagonal
    val diag = Array.tabulate(5, 5)((i, j) => if (i == j) (i + 1).toDouble else 0.0)
    val ev1 = EmbeddingStats.jacobiEigenvalues(diag).sorted
    assert(ev1.zip(Seq(1.0, 2.0, 3.0, 4.0, 5.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // 2x2 [[2,1],[1,2]] has eigenvalues 1 and 3
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val ev2 = EmbeddingStats.jacobiEigenvalues(m).sorted
    assert(math.abs(ev2.head - 1.0) < 1e-9 && math.abs(ev2(1) - 3.0) < 1e-9)
  }

  test("distributed PCA equals a driver-side covariance eigensolve") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    }
    val expect = EmbeddingStats.jacobiEigenvalues(cov)
      .sorted(Ordering[Double].reverse)
    val total = expect.sum
    val got = EmbeddingStats.pcaVariance(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 10)
    got.zipWithIndex.foreach { case ((c, ev, share, _), i) =>
      assert(c == i + 1)
      assert(math.abs(ev - expect(i)) < 1e-6, s"component $c eigenvalue")
      assert(math.abs(share - expect(i) / total) < 1e-6, s"component $c share")
    }
    // spectrum properties: non-increasing, non-negative, shares cumulate
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 - 1e-9)
    case _ => () }
    assert(got.forall(_._2 >= -1e-9))
    assert(got.last._4 <= 1.0 + 1e-6)
  }

  test("k-means equals a driver-side Lloyd replay; assignments optimal " +
      "for the final centroids") {
    val q = 1000000L
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray.map(x =>
          BigDecimal(x * q).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
      .sortBy(_._1)
    val k = 8
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def assign(cs: Array[Array[Long]], v: Array[Long]): (Int, Long) =
      cs.zipWithIndex.map { case (c, i) => (d2(c, v), i) }.min match {
        case (d, i) => (i, d)
      }
    var cents = rows.take(k).map(_._2)
    for (_ <- 1 to 3) {
      val groups = rows.groupBy { case (_, v) => assign(cents, v)._1 }
      cents = cents.zipWithIndex.map { case (old, c) =>
        groups.get(c) match {
          case Some(g) => Array.tabulate(old.length) { i =>
            BigDecimal(g.map(_._2(i)).sum.toDouble / g.length)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }
          case None => old
        }
      }
    }
    val expect = rows.map { case (id, v) =>
      val (c, d) = assign(cents, v); (id, c, d)
    }.toSet
    val got = EmbeddingStats.kmeansAssignments(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect, s"diff=${(expect -- got).take(3)}")
    // every vector landed on a genuinely nearest final centroid
    assert(got.map(_._2).size == k, "some cluster emptied")
  }

  test("silhouette: partition of the corpus, values in [-1, 1], " +
      "exact micro-unit means") {
    val sil = EmbeddingStats.kmeansSilhouette(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val n = Tables.embeddings(spark, sf0001).count()
    assert(sil.map(_._2).sum == n, "cluster sizes must partition the corpus")
    assert(sil.forall { case (_, _, s) => s >= -1.0 && s <= 1.0 })
    assert(sil.map(_._1).toSet == (0 until 8).toSet)
    // deterministic: a second run is bit-identical
    val again = EmbeddingStats.kmeansSilhouette(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSet == sil.toSet)
  }

  test("effective rank: consistent with the PCA spectrum, bounded by dims") {
    val row = EmbeddingStats.effectiveRank(spark, sf0001).head()
    val (dims, er, top1, h) = (row.getInt(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(er > 1.0 && er <= dims + 1e-6)
    assert(h > 0.0 && math.abs(math.exp(h) - er) < 1e-3)
    val pcaTop = EmbeddingStats.pcaVariance(spark, sf0001).collect()
      .find(_.getInt(0) == 1).get.getDouble(2)
    assert(math.abs(top1 - pcaTop) < 1e-5, s"$top1 vs $pcaTop")
  }

  test("fisher separability replays a driver-side two-level scatter") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def q(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val dims = rows.head._2.length
    val cells = scala.collection.mutable.Map
      .empty[(Int, Int), (Long, Long, BigInt)]
      .withDefaultValue((0L, 0L, BigInt(0)))
    rows.foreach { case (l, v) =>
      v.indices.foreach { d =>
        val x6 = q(v(d).toDouble * 1e6)
        val (nl, s, x2) = cells((l, d))
        cells((l, d)) = (nl + 1, s + x6, x2 + BigInt(x6) * x6)
      }
    }
    var b = BigInt(0); var w = BigInt(0)
    (0 until dims).foreach { d =>
      val forD = cells.filter(_._1._2 == d)
      val g6 = q(forD.values.map(_._2).sum.toDouble /
        forD.values.map(_._1).sum)
      forD.values.foreach { case (nl, s, x2) =>
        val m6 = q(s.toDouble / nl)
        b += BigInt(nl) * (m6 - g6) * (m6 - g6)
        w += x2 - BigInt(2) * m6 * s + BigInt(nl) * m6 * m6
      }
    }
    val expect = BigDecimal(b.toDouble / w.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = EmbeddingStats.fisherSeparability(spark, sf0001).head()
    assert(row.getLong(0) == rows.map(_._1).distinct.length)
    assert(row.getLong(1) == dims)
    assert(row.getLong(2) == b.toLong && row.getLong(3) == w.toLong)
    assert(row.getDouble(4) == expect)
    assert(row.getDouble(4) >= 0.0)
  }

  test("cluster-label purity replays the assignment contingency") {
    val assign = graft.operators.EmbeddingStats
      .kmeansAssignments(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val labels = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val expected = assign.groupBy(_._2).map { case (cid, members) =>
      val byLabel = members.keys.toSeq.map(labels).groupBy(identity)
        .map { case (l, xs) => (l, xs.size.toLong) }
      val (topL, topN) = byLabel.toSeq.minBy { case (l, n) => (-n, l) }
      cid -> ((members.size.toLong, topL, topN,
        topN * 1000L / members.size))
    }
    val got = graft.operators.EmbeddingStats
      .clusterLabelPurity(spark, sf0001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    got.values.foreach { case (n, _, nTop, p) =>
      assert(nTop <= n && p >= 1000 / 50 && p <= 1000) // 50 labels
    }
  }

  test("alignment/uniformity replays a driver-side Wang-Isola computation") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](2).toArray.map(_.toDouble)
        val mag = math.sqrt(v.map(x => x * x).sum)
        (r.getLong(0), r.getInt(1), if (mag == 0) v else v.map(_ / mag))
      }.sortBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      r6(2.0 - 2.0 * dot)
    }
    // positives: lead within label in vec_id order
    val posTerms = vecs.groupBy(_._2).values.toSeq.flatMap { g =>
      val s = g.sortBy(_._1)
      s.zip(s.drop(1)).map { case (a, b) => q(d2(a._3, b._3) * 1e6) }
    }
    // uniformity: first-64-ids probe panel against everyone else
    val panel = vecs.filter(_._1 < 64)
    val uniTerms = for {
      a <- vecs; p <- panel if a._1 != p._1
    } yield q(math.exp(-2.0 * d2(a._3, p._3)) * 1e9)
    val expAlign = r6(posTerms.sum.toDouble / posTerms.length / 1e6)
    val expUni = r6(math.log(uniTerms.sum.toDouble / uniTerms.length / 1e9))
    val row = graft.operators.EmbeddingStats
      .alignmentUniformity(spark, sf0001).head()
    assert(row.getLong(0) == posTerms.length)
    assert(row.getDouble(1) == expAlign,
      s"alignment ${row.getDouble(1)} vs $expAlign")
    assert(row.getLong(2) == uniTerms.length)
    assert(row.getDouble(3) == expUni,
      s"uniformity ${row.getDouble(3)} vs $expUni")
    // sanity of the health summary itself: positives sit closer than
    // the uniform background implies, and mass is spread (uni < 0)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(3) < 0.0)
  }

  test("centroid classifier matches a driver-side replay of the whole chain") {
    val q = 1000000L
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(x => BigDecimal(x.toDouble * q)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong),
        r.getInt(2)))
      .sortBy(_._1)
    val splitAt = math.round(0.95 * rows.length)
    val (train, test) = rows.partition(_._1 < splitAt)
    val byLabel = train.groupBy(_._3).toSeq.sortBy(_._1)
    val labels = byLabel.map(_._1).toArray
    val cents = byLabel.map { case (_, g) =>
      val dims = g.head._2.length
      val s = new Array[Long](dims)
      g.foreach(r => for (i <- 0 until dims) s(i) += r._2(i))
      s.map(x => BigDecimal(x.toDouble / g.length)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toArray
    val expected = test.map { case (id, v, l) =>
      val d2 = cents.map(c => c.zip(v).map { case (a, b) =>
        (b - a) * (b - a) }.sum)
      val best = d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      (id, l, labels(best))
    }.toSet
    assert(expected.nonEmpty)
    val got = EmbeddingStats.centroidPredictions(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected)
    // the confusion rollup conserves the prediction relation
    val conf = EmbeddingStats.centroidConfusion(spark, sf0001)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(conf == expected.size)
  }

  test("TwoNN intrinsic dimension matches a driver-side MLE replay") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      BigDecimal(1 - math.max(dot / (math.sqrt(na) * math.sqrt(nb)), 0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val logs = vecs.flatMap { case (id, v) =>
      val ds = vecs.filter(_._1 != id).map(o => cosDist(v, o._2)).sorted
      val (r1, r2) = (ds(0), ds(1))
      if (r1 > 0)
        Some(BigDecimal(math.log(r2 / r1) * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      else None
    }
    val expDim = BigDecimal(logs.length * 1000000.0 / logs.sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = EmbeddingStats.twoNNIntrinsicDim(spark, sf0001).collect()(0)
    assert(row.getLong(0) == vecs.length)
    assert(row.getLong(1) == logs.length, s"n_used ${row.getLong(1)}")
    assert(row.getLong(2) == logs.sum, s"sum_log ${row.getLong(2)}")
    assert(row.getDouble(3) == expDim, s"dim ${row.getDouble(3)} vs $expDim")
    // a 64-d cloud's manifold dimension is positive and bounded by the
    // ambient dimension (sanity of the estimator, not just the replay)
    assert(row.getDouble(3) > 0 && row.getDouble(3) <= 64.0)
  }

  test("hubness: histogram covers the universe, skew replays driver-side") {
    val topk = graft.knn.ExactKnn.selfTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (baseDf, _, _, _) = graft.knn.ExactKnn.split(spark, sf0001)
    val baseIds = baseDf.select("vec_id").collect().map(_.getLong(0))
    val occ = baseIds.map(v => topk.count(_._2 == v).toLong)
    val n = occ.length.toDouble
    val s1 = occ.sum; val s2 = occ.map(x => x * x).sum
    val s3 = occ.map(x => x * x * x).sum
    val mu = s1 / n
    val m2 = s2 / n - mu * mu
    val m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    val skew = BigDecimal(m3 / (m2 * math.sqrt(m2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hist = occ.groupBy(identity).map { case (o, g) => o -> g.length.toLong }
    val got = graft.operators.EmbeddingStats.hubness(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => t._1 -> t._2).toMap == hist, "histogram diverges")
    got.foreach(t => assert(t._3 == skew, s"skew ${t._3} vs $skew"))
    // the mean of N_k is exactly k when every row has a full top-k
    assert(s1 == occ.length * 5L, "sum of k-occurrences must be n*k")
    // zero-filled anti-hubs are present on a gaussian fixture
    assert(hist.contains(0L), "no anti-hubs found - zero-fill broken?")
  }

  test("mutual-kNN clusters equal a driver union-find over the pairs") {
    val pairs = graft.knn.ExactKnn.mutualKnnPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // canonicalize to component MINIMUM (union by min above only
    // guarantees a consistent root, which is already the min here)
    val comp = parent.keys.groupBy(find).flatMap { case (_, ms) =>
      val mn = ms.min; ms.map(_ -> mn) }
    val got = EmbeddingStats.mutualKnnClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == comp, s"components diverge: ${got.size} vs ${comp.size}")
    // clustering is non-trivial: at least one component has >= 3
    // members (a transitive merge happened, not just isolated pairs)
    assert(got.groupBy(_._2).values.map(_.size).max >= 3,
      "no transitive cluster formed on the fixture")
  }
}
