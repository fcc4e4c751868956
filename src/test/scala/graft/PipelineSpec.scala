package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** Composed pipeline ops: single-pass plan shape + gate semantics. */
class PipelineSpec extends SparkSpec {

  test("training corpus runs as ONE documents scan (no self-joins)") {
    val plan = Pipeline.trainingCorpus(spark, sf0001)
      .queryExecution.executedPlan.toString
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single scan, got $scans:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "composed filters must not become joins")
  }

  test("training corpus rows satisfy every gate") {
    val rows = Pipeline.trainingCorpus(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.5)
      assert(r.getAs[String]("pred_lang") == "en")
      val t = r.getAs[Int]("n_bpe_tokens")
      assert(t >= 10 && t <= 10000)
    }
  }

  test("stratified sample is deterministic and respects stratum rates") {
    val a = Pipeline.stratifiedSample(spark, sf0001).collect()
    val b = Pipeline.stratifiedSample(spark, sf0001).collect()
    assert(a.sortBy(_.getLong(0)).sameElements(b.sortBy(_.getLong(0))))
    a.foreach { r =>
      val cap = if (r.getAs[String]("lang") == "en") 10L else 30L
      assert(r.getAs[Long]("bucket") < cap)
    }
  }

  test("pack shards: contiguous per-language shards near the budget") {
    val budget = 2000L
    val rows = graft.operators.Pipeline.packShards(spark, sf0001, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      // shard ids are non-decreasing in doc order and start at 0
      assert(ordered.head._4 == 0L)
      assert(ordered.sliding(2).forall {
        case Array(a, b) => b._4 >= a._4; case _ => true })
      // each shard's token sum stays under budget + its last doc's size
      ordered.groupBy(_._4).foreach { case (_, inShard) =>
        val toks = inShard.map(_._3).sum
        assert(toks < budget + inShard.map(_._3).max,
          s"shard overfilled: $toks tokens")
      }
    }
  }

  test("heavy hitters: bounded per group, ranked by count then token") {
    val rows = Pipeline.heavyHitterTokens(spark, sf0001).collect()
    rows.groupBy(_.getAs[String]("lang")).values.foreach { g =>
      assert(g.length <= 10)
      val byRank = g.sortBy(_.getAs[Int]("rk"))
      val ns = byRank.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.drop(1)).forall { case (x, y) => x >= y })
    }
  }

  test("temperature sample: α=0.5 weights, deterministic keeps, rebalancing") {
    val rows = Pipeline.temperatureSample(spark, sf0001).collect().map(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Double]("q"),
        r.getAs[Long]("keep_permille"), r.getAs[Long]("n_kept"))).sortBy(_._1)
    assert(rows.nonEmpty)
    // weights are a distribution; permilles bounded
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    rows.foreach { case (_, _, _, p, _) => assert(p >= 0 && p <= 1000) }
    // n_kept matches a driver-side replay of the doc_id % 1000 rule
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { case (lang, n, _, p, kept) =>
      val mine = docs.filter(_._2 == lang)
      assert(mine.length.toLong == n)
      assert(mine.count(_._1 % 1000 < p).toLong == kept,
        s"$lang: kept $kept != replay")
    }
    // temperature flattens the mix: keep RATE is monotone non-increasing
    // in language size (rate ∝ n^-0.5)
    val bySize = rows.sortBy(_._2)
    val permilles = bySize.map(_._4)
    assert(permilles.zip(permilles.drop(1)).forall { case (small, big) =>
      small >= big },
      s"keep rates not inverse to size: ${bySize.mkString(", ")}")
  }

  test("train/val/test: deterministic, complete, roughly 70/15/15, map-only") {
    val rows = Pipeline.trainValTest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.length == Tables.documents(spark, sf0001).count())
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / rows.length)
    assert(math.abs(frac("train") - 0.703) < 0.1, frac.toMap.toString)
    assert(math.abs(frac("val") - 0.145) < 0.08, frac.toMap.toString)
    assert(math.abs(frac("test") - 0.152) < 0.08, frac.toMap.toString)
    // stability: same assignment on re-evaluation (pure hash, no RNG)
    val again = Pipeline.trainValTest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSet == again.toSet)
    // map-only: no shuffle anywhere in the plan
    val plan = Pipeline.trainValTest(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("dataset card replays driver-side corpus scalars") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val words = docs.map(_._3.split(" ").length.toLong).sum
    val got = Pipeline.datasetCard(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_docs") == docs.length.toDouble)
    assert(got("n_languages") == docs.map(_._1).distinct.length.toDouble)
    assert(got("n_sources") == docs.map(_._2).distinct.length.toDouble)
    assert(got("total_words") == words.toDouble)
    assert(got("exact_dup_docs") ==
      (docs.length - docs.map(_._3).distinct.length).toDouble)
    assert(math.abs(got("avg_words") -
      math.rint(words.toDouble / docs.length * 1e6) / 1e6) < 1e-9)
  }

  test("negative sampling: k per query, disjoint from positives, stable") {
    val neg = Pipeline.negativeSampling(spark, sf0001, k = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pos = graft.knn.ExactKnn.topKBatch(spark, sf0001, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    neg.groupBy(_._1).values.foreach { g =>
      assert(g.length == 7 && g.map(_._3).sorted.sameElements(1 to 7))
    }
    assert(neg.forall { case (q, v, _) => !pos((q, v)) },
      "a sampled negative is a true neighbor")
    val again = Pipeline.negativeSampling(spark, sf0001, k = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(neg.toSet == again.toSet)
  }

  test("k-sample per group: md5 order replayed driver-side, heap-planned") {
    val df = Pipeline.kSamplePerGroup(spark, sf0001, k = 7)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    got.groupBy(_._1).values.foreach { g =>
      assert(g.length == 7 && g.map(_._3).sorted.sameElements(1 to 7))
    }
    // replay: smallest-k md5 hexes per type
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      g.map { case (_, id) => (t, id, md5hex(id.toString)) }
        .sortBy(e => (e._3, e._2)).take(7).map(e => (t, e._2))
    }.toSet
    assert(got.map(e => (e._1, e._2)).toSet == expect)
    // the selection plans through the bounded-heap operator
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
  }

  test("weighted sample equals a driver-side A-ES draw; heap-planned") {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    val expect = docs.map { case (id, lang, w) =>
      val u = (polyHash(s"$id:wsample") + 1.0) / (P + 1.0)
      val key = BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lang, id, w, key)
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.toSeq.sortBy(e => (-e._4, e._2)).take(20).zipWithIndex
        .map { case ((lang, id, w, key), i) => (lang, id, w, key, i + 1) }
    }.toSet
    val df = Pipeline.weightedSample(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    assert(got == expect && got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
  }

  test("shard balance: conserves tokens, brackets the mean, imbalance >= 1") {
    val shards = Pipeline.packShards(spark, sf0001)
      .groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Pipeline.shardBalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val byLang = shards.groupBy(_._1)
    got.foreach { case (lang, nShards, mn, mx, mean, imb) =>
      val loads = byLang(lang).map(_._3)
      assert(nShards == loads.length && mn == loads.min && mx == loads.max)
      assert(mn <= mean && mean <= mx)
      assert(imb >= 1.0 - 1e-9)
    }
  }

  test("quality classifier: GD distills the gate well above the majority baseline") {
    val got = Pipeline.qualityClassifier(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got.keySet == Set("w0", "w1", "w2", "w3", "w4", "train_acc"))
    // majority-class baseline of the quality>=0.5 gate label
    val q = operators.TextOps.qualityScores(spark, sf0001)
      .select(when(col("quality") >= 0.5, 1.0).otherwise(0.0).as("y"))
    val n = q.count().toDouble
    val pos = q.agg(sum(col("y"))).head.getDouble(0) / n
    val base = math.max(pos, 1.0 - pos)
    assert(got("train_acc") >= base + 0.1,
      s"model must beat predicting the majority class (${got("train_acc")} vs $base)")
    // the fit uses the features, not just the intercept
    assert(math.abs(got("w1")) + math.abs(got("w2")) > 1.0, got.toString)
  }

  test("RDD gradient loop is bit-identical to the DataFrame aggregate twin") {
    // the closure loop replaced 50 per-round Catalyst plan+codegen
    // cycles; every arithmetic step (dot fold order, ((σ−y)·f)·1e6
    // association, HALF_UP millionths quantization) must reproduce the
    // expression form exactly or the chained-CTE oracle breaks
    val fast = Pipeline.trainedWeights(spark, sf0001, 7, 5.0)
    val slow = Pipeline.trainedWeightsDf(spark, sf0001, 7, 5.0)
    assert(fast.toSeq == slow.toSeq,
      s"weight divergence: ${fast.toSeq} vs ${slow.toSeq}")
  }

  test("classifier AUC: counts cover the corpus and the fit separates") {
    val r = Pipeline.classifierAuc(spark, sf0001).head()
    val total = Tables.documents(spark, sf0001).count()
    assert(r.getAs[Long]("np") + r.getAs[Long]("nn") == total)
    val auc = r.getAs[Double]("auc")
    assert(auc > 0.8 && auc <= 1.0, s"expected a separating fit, got $auc")
  }

  test("calibration bins partition the corpus; mean prediction stays in-bin") {
    val rows = Pipeline.classifierCalibration(spark, sf0001).collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[Int]("bin")
      val mp = r.getAs[Double]("mean_pred")
      assert(b >= 0 && b <= 9)
      // bin 9 absorbs everything >= 0.9 (sigmoid < 1.0 always)
      assert(mp >= b / 10.0 - 1e-6 && mp < (b + 1) / 10.0 + (if (b == 9) 0.1 else 1e-6),
        s"bin $b mean_pred $mp outside its decile")
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("dsir weights: target-language docs score higher; token counts exact") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang")
    val w = Pipeline.dsirWeights(spark, sf0001).join(docs, Seq("doc_id")).cache()
    assert(w.count() == 500)
    val avgEn = w.filter(col("lang") === "en")
      .agg(avg(col("log_weight"))).head.getDouble(0)
    val avgOther = w.filter(col("lang") =!= "en")
      .agg(avg(col("log_weight"))).head.getDouble(0)
    assert(avgEn > avgOther,
      s"importance weighting must favor the target slice ($avgEn vs $avgOther)")
    // n_tokens is the exact whitespace token count of each doc
    val bad = w.join(
      Tables.documents(spark, sf0001)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("nt")),
      Seq("doc_id"))
      .filter(col("n_tokens") =!= col("nt")).count()
    assert(bad == 0)
    w.unpersist()
  }

  test("mixture plan: shares sum to 1 and allocation is consistent") {
    val rows = graft.operators.Pipeline.mixturePlan(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val shareSum = rows.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    val sampledSum = rows.map(_._5).sum
    assert(math.abs(sampledSum - 100000L) <= rows.length,
      s"sampled sum $sampledSum")
    rows.foreach { case (src, nd, nt, share, sampled, epochs) =>
      assert(nd > 0 && nt > 0, src)
      // epochs == sampled tokens / actual tokens (to rounding)
      assert(math.abs(epochs - sampled.toDouble / nt) < 1e-3, src)
      // sqrt temperature compresses: every source's share sits between
      // uniform (1/n) and its raw token share only on the heavy side;
      // minimally: shares ordered like token masses
      assert(share > 0.0, src)
    }
    val byTokens = rows.sortBy(_._3).map(_._1).toSeq
    val byShare = rows.sortBy(_._4).map(_._1).toSeq
    assert(byTokens == byShare, "shares must be monotone in token mass")
  }

  test("leakage-safe split never splits a near-dup cluster") {
    val rows = graft.operators.Pipeline.leakageSafeSplit(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 500)
    // one split value per cluster representative
    rows.groupBy(_._2).foreach { case (rep, g) =>
      assert(g.map(_._3).distinct.length == 1,
        s"cluster $rep straddles splits: ${g.map(_._3).distinct.toSeq}")
    }
    // all three splits materialize and train dominates
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit.toString)
    assert(bySplit("train") > bySplit("val") &&
      bySplit("train") > bySplit("test"), bySplit.toString)
  }

  test("sliced AUC: one row per language, counts tile the corpus") {
    val rows = graft.operators.Pipeline.classifierAucByLang(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    // slice counts tile the corpus exactly
    assert(rows.map(t => t._2 + t._3).sum == 500)
    rows.foreach { case (lang, np, nn, auc) =>
      if (np > 0 && nn > 0) {
        assert(auc.isDefined && auc.get >= 0.0 && auc.get <= 1.0,
          s"$lang: $auc")
      } else assert(auc.isEmpty, s"$lang: degenerate slice must be NULL")
    }
    // the separable target stays separable on at least one real slice
    assert(rows.exists(_._4.exists(_ > 0.8)), rows.mkString(","))
  }

  test("lift curve: valid gains invariants, full-set lift is exactly 1") {
    val rows = graft.operators.Pipeline.classifierLift(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._2)
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, np, lift) =>
      assert(np <= n && lift >= 0.0)
    }
    // cumulative counts strictly increase down the score scan
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._2 && a._3 <= b._3)
      case _ => ()
    }
    // the full corpus has lift exactly 1 by construction
    assert(rows.last._4 == 1.0)
    // the best cut must beat random selection on this separable target
    assert(rows.head._4 > 1.0, s"top-cut lift ${rows.head._4}")
  }

  test("curriculum: total order, contiguous deciles of ~equal size") {
    val rows = graft.operators.Pipeline.curriculum(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 500)
    val byRank = rows.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1L to 500L).toSeq)
    // quality non-increasing down the schedule; ties broken by doc_id
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ => ()
    }
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L to 9L).toSet)
    assert(sizes.values.forall(_ == 50))
  }

  test("epoch shuffle: a permutation per epoch, epochs independent, window-free") {
    val e1 = graft.operators.Pipeline.epochShuffle(spark, sf0001, epoch = 1)
    val rows1 = e1.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows1.length == 500)
    // a true permutation: positions are exactly 1..n
    assert(rows1.map(_._2).sorted.toSeq == (1L to 500L).toSeq)
    // a different epoch draws a genuinely different order
    val rows2 = graft.operators.Pipeline.epochShuffle(spark, sf0001, epoch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val moved = rows1.count { case (id, p) => rows2(id) != p }
    assert(moved > 450, s"epoch 2 kept ${500 - moved} positions fixed")
    // corpus-scale by construction: range-partitioned, no window
    assert(!e1.queryExecution.executedPlan.toString.contains("Window"))
    assert(e1.rdd.getNumPartitions > 1)
  }

  test("k-center coreset replays the driver-side greedy traversal") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val mag = math.sqrt(s)
        (r.getLong(0), if (mag == 0.0) v else v.map(_ / mag))
      }.sortBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byId = vecs.toMap
    var centers = Vector((vecs.head._1, 0.0))
    while (centers.length < 8) {
      val picked = centers.map(_._1).toSet
      val best = vecs
        .map { case (id, v) =>
          val md = centers.map { case (cid, _) =>
            r6(1.0 - math.max(dot(v, byId(cid)), 0.0))
          }.min
          (id, md)
        }
        .maxBy { case (id, md) => (md, -id) }
      assert(!picked(best._1), "greedy re-picked a center")
      centers = centers :+ best
    }
    val expect = centers.zipWithIndex
      .map { case ((id, r), i) => (i + 1L, id, r) }
    val got = graft.operators.Pipeline.kCenterCoreset(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toVector
    assert(got == expect)
    // covering radius is non-increasing down the greedy picks
    got.drop(1).map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"radius grew: $a -> $b")
      case _ => ()
    }
  }

  test("sequence packing: contiguous token stream, consistent seq spans") {
    val budget = 512L
    val rows = graft.operators.Pipeline.packSequences(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.length == 500)
    // offsets tile the concatenated stream with no gaps or overlaps
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._2,
        s"doc ${b._1}: start ${b._3} != ${a._3} + ${a._2}")
      case _ => ()
    }
    rows.foreach { case (id, nTok, start, sSeq, eSeq, off, nSeqs) =>
      assert(nTok >= 1, s"doc $id empty")
      assert(sSeq * budget + off == start, s"doc $id offset identity")
      assert(eSeq == (start + nTok - 1) / budget, s"doc $id end seq")
      assert(nSeqs == eSeq - sSeq + 1 && nSeqs >= 1, s"doc $id span")
    }
    // every cut sequence before the last is fully covered: the docs
    // intersecting seq s contribute exactly `budget` tokens to it
    val total = rows.last._3 + rows.last._2
    val lastSeq = (total - 1) / budget
    val covered = Array.fill((lastSeq + 1).toInt)(0L)
    rows.foreach { case (_, nTok, start, sSeq, eSeq, _, _) =>
      (sSeq to eSeq).foreach { s =>
        val lo = math.max(start, s * budget)
        val hi = math.min(start + nTok, (s + 1) * budget)
        covered(s.toInt) += hi - lo
      }
    }
    (0L until lastSeq).foreach { s =>
      assert(covered(s.toInt) == budget, s"seq $s fill ${covered(s.toInt)}")
    }
    assert(covered(lastSeq.toInt) == total - lastSeq * budget)
  }

  test("Brier score: bounds, Murphy identity within binning slack") {
    val row = graft.operators.Pipeline.classifierBrier(spark, sf0001).head()
    val (n, brier, unc, rel, res) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(n > 0)
    assert(brier >= 0.0 && brier <= 1.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-9) // p(1-p) peaks at 0.25
    assert(rel >= 0.0 && res >= 0.0)
    assert(res <= unc + 1e-6, "resolution cannot exceed uncertainty")
    // REL − RES + UNC equals the brier computed from BINNED
    // predictions; the gap to the unbinned brier is the within-bin
    // prediction variance — small for 10 bins, never negative-large
    val gap = brier - (rel - res + unc)
    assert(math.abs(gap) <= 0.02, s"Murphy identity gap $gap")
    // a trained model must beat the climatological forecaster (whose
    // brier IS the uncertainty term)
    assert(brier < unc, s"brier $brier not better than base rate $unc")
  }

  test("isotonic calibration: minimax fit equals the classic PAV stack, " +
      "is monotone, and preserves the weighted mean") {
    val rows = Pipeline.classifierIsotonic(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 2 && rows.length <= 64)
    // bins arrive sorted and the fit never decreases
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1, "bins out of order")
        assert(a._5 <= b._5 + 1e-12, s"fit not monotone at bin ${b._1}")
      case _ => ()
    }
    // classic pool-adjacent-violators stack on the same (nk, sy) rows —
    // by the Barlow et al. theorem the two constructions coincide
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    rows.foreach { case (_, nk, sy, _, _) =>
      var (cn, cs) = (nk, sy)
      while (stack.nonEmpty &&
          stack.last._2.toDouble * cn >= cs.toDouble * stack.last._1) {
        val (pn, ps) = stack.remove(stack.length - 1)
        cn += pn; cs += ps
      }
      stack += ((cn, cs))
    }
    // re-expand the pooled blocks back over their member bins
    val fits = scala.collection.mutable.ArrayBuffer.empty[Double]
    var bi = 0
    stack.foreach { case (cn, cs) =>
      var covered = 0L
      while (covered < cn) {
        fits += cs.toDouble / cn.toDouble
        covered += rows(bi)._2
        bi += 1
      }
    }
    assert(fits.length == rows.length)
    rows.indices.foreach { i =>
      // the declared column is rounded 6; PAV raw values match under it
      val pav6 = BigDecimal(fits(i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(i)._5 == pav6,
        s"bin ${rows(i)._1}: minimax ${rows(i)._5} vs PAV $pav6")
    }
    // the isotonic fit preserves total positives (projection property)
    val wsum = rows.map { case (_, nk, _, _, f) => nk.toDouble * f }.sum
    val posSum = rows.map(_._3).sum.toDouble
    // slack: each of the <=64 published fits is rounded to 6 decimals,
    // so the weighted sum drifts at most n_docs * 5e-7 from exact
    assert(math.abs(wsum - posSum) < 5e-7 * rows.map(_._2).sum + 1e-9,
      s"weighted fit sum $wsum vs positives $posSum")
  }

  test("perplexity band keeps the per-language interquartile middle " +
      "exactly (driver quartile replay)") {
    val nll = graft.operators.TextOps.kneserNeySurprisal(spark, sf0001)
      .select(col("doc_id"), col("kn_mean_nll")).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toMap
    val langs = Tables.documents(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = nll.toSeq.groupBy { case (id, _) => langs(id) }
      .view.mapValues(_.map(_._2).sorted).toMap
    def q4(xs: Seq[Long], p: Double): Long = {
      // 4x the (n-1)p-interpolated quantile of integers — exact
      val h = (xs.length - 1) * p
      val lo = h.toInt
      val g4 = math.round(4 * (h - lo)) // in {0,1,2,3}
      (4 - g4) * xs(lo) + g4 * xs(math.min(lo + 1, xs.length - 1))
    }
    val got = Pipeline.perplexityBandPrune(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == byLang.keySet)
    got.foreach { case (lang, (nDocs, nKept, lo4, hi4)) =>
      val xs = byLang(lang)
      assert(nDocs == xs.length, s"$lang n_docs")
      assert(lo4 == q4(xs, 0.25), s"$lang lo4 $lo4 vs ${q4(xs, 0.25)}")
      assert(hi4 == q4(xs, 0.75), s"$lang hi4 $hi4 vs ${q4(xs, 0.75)}")
      val kept = xs.count(x => x * 4 >= lo4 && x * 4 <= hi4)
      assert(nKept == kept, s"$lang n_kept $nKept vs $kept")
      // the closed interquartile band keeps ~half: at least
      // floor(n/2) - 1 (interpolated cut points can sit strictly
      // between discrete values, shaving one element per side)
      assert(nKept >= nDocs / 2 - 1, s"$lang band too narrow: $nKept/$nDocs")
    }
  }

  test("pad efficiency: driver replay; sorting strictly reduces waste") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def audit(sorted: Boolean): (Long, Long, Long, Long) = {
      val ord = if (sorted) toks.sortBy(t => (t._2, t._1))
        else toks.sortBy(_._1)
      val batches = ord.grouped(32).toSeq
      val total = ord.map(_._2).sum
      val padded = batches.map(b => b.length * b.map(_._2).max).sum
      (batches.length.toLong, total, padded,
        (padded - total) * 1000 / padded)
    }
    val expect = Map("arrival" -> audit(false),
      "length_sorted" -> audit(true))
    val got = Pipeline.padEfficiency(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == expect, s"$got vs $expect")
    // the business case: sorting must strictly cut padded volume on a
    // variable-length corpus
    assert(got("length_sorted")._3 < got("arrival")._3,
      "length-sorted batching saved nothing")
  }

  test("uncertainty sample is the exact boundary-distance cut") {
    val w = Pipeline.trainedWeights(spark, sf0001, 50, 5.0)
    // independent margin replay straight from the raw text (same
    // feature formulas), using the separately-gated trained weights
    val all = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map { r =>
        val id = r.getLong(0); val t = r.getString(1)
        val ws = t.split(" ")
        val wcnt = ws.length.toDouble
        val f = Array(1.0,
          math.min(t.length.toDouble / 500.0, 1.0),
          math.min(wcnt / 100.0, 1.0),
          math.min(t.replace(" ", "").length.toDouble / wcnt / 10.0, 1.0),
          ws.distinct.length.toDouble / wcnt)
        val z = (0 to 4).map(j => w(j) * f(j)).sum
        val q = new java.math.BigDecimal(java.lang.Double.toString(z * 1e6))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        (id, math.abs(q), if (q >= 0) 1 else 0)
      }
    val expect = all.sortBy(t => (t._2, t._1)).take(50).toSeq
    val got = Pipeline.uncertaintySample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expect, s"cut diverges: ${got.take(3)} vs ${expect.take(3)}")
    // the cut property: every selected margin <= every excluded margin
    val maxSel = got.map(_._2).max
    val excluded = all.map(t => (t._1, t._2)).toMap -- got.map(_._1)
    assert(excluded.values.forall(_ >= maxSel))
  }
}
