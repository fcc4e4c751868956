package graft

import org.apache.spark.sql.functions._

import graft.knn.ExactKnn

class ExactKnnSpec extends SparkSpec {

  test("split is a deterministic 95/5 prefix split (dataset.rs:19-23)") {
    val (base, queries, splitAt, n) = ExactKnn.split(spark, sf0001)
    assert(n == 500 && splitAt == 475)
    assert(base.count() == 475 && queries.count() == 25)
    assert(base.agg(max("vec_id")).head().getLong(0) == 474)
    assert(queries.agg(min("vec_id")).head().getLong(0) == 475)
  }

  test("single top-k: 10 ascending rows, distances in [0,1]") {
    val rows = SparkEntry.queries("knn_exact_single")(spark, sf0001).collect()
    assert(rows.length == 10)
    val ds = rows.map(_.getDouble(1))
    assert(ds.sameElements(ds.sorted) && ds.forall(d => d >= 0 && d <= 1))
  }

  test("batch top-k: every query gets exactly k rows; self-query sanity") {
    val got = SparkEntry.queries("knn_exact_batch")(spark, sf0001)
    val perQ = got.groupBy("qid").count().collect()
    assert(perQ.length == 25 && perQ.forall(_.getLong(1) == 10))
  }

  test("range search: all and only pairs within the radius, filter in-join") {
    val r = ExactKnn.rangeSearch(spark, sf0001, radius = 0.75, nq = 5)
    val rows = r.collect()
    assert(rows.nonEmpty, "radius 0.75 must catch some sf0.001 pairs")
    assert(rows.forall(_.getAs[Double]("dist") <= 0.75))
    // completeness: brute-force one query's matches
    val (base, queries, splitAt, _) = ExactKnn.split(spark, sf0001)
    val q0 = queries.filter(col("vec_id") === splitAt)
      .select(col("emb").as("qvec"))
    val expect = base.crossJoin(broadcast(q0))
      .select(col("vec_id"), ExactKnn.dist(col("emb"), col("qvec")).as("d"))
      .filter(col("d") <= 0.75).count()
    assert(rows.count(_.getAs[Long]("qid") == splitAt) == expect)
  }

  test("filtered top-k: every neighbor carries the requested label") {
    val got = ExactKnn.topKBatchFiltered(spark, sf0001, label = 3, k = 5, nq = 10)
    val labels = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r.getAs[Long]("vec_id")) == 3))
    val perQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(perQ.size == 10 && perQ.values.forall(_.length == 5))
  }

  test("filtered top-k pushes the label predicate to the parquet scan") {
    val plan = ExactKnn.topKBatchFiltered(spark, sf0001, label = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,3)"),
      s"label filter not pushed to the scan:\n${plan.take(4000)}")
    // and the scan must NOT read the text-sized columns it doesn't need
    assert(!plan.contains("ReadSchema") || !plan.contains("struct<vec_id:bigint,label:int,embedding:array<float>,text"),
      "scan reads more columns than the projection needs")
  }

  test("faceted top-k: per-(query,label) groups, consistent with the flat batch") {
    val rows = ExactKnn.topKPerLabelBatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(rows.nonEmpty)
    val groups = rows.groupBy(r => (r._1, r._2))
    groups.foreach { case ((qid, label), g) =>
      assert(g.length <= 3, s"($qid,$label) has ${g.length} rows")
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to g.length).toSeq)
      // rank order == (dist, vec_id) order within the facet
      assert(sorted.sortBy(x => (x._4, x._3)).toSeq == sorted.toSeq)
    }
    // facet union contains the overall top-1: the best base point for
    // any query is rank 1 within its own label
    val flat = ExactKnn.topKBatch(spark, sf0001).filter(col("rk") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val facetTop = rows.filter(_._5 == 1).map(r => (r._1, r._3)).toSet
    val inScope = flat.filter { case (q, _) =>
      rows.exists(_._1 == q) } // same nq window
    assert(inScope.subsetOf(facetTop))
  }

  test("search after insertMany equals searching the full prefix directly") {
    // the 90% base + 5% inserted slab IS the 95% prefix — insert must be
    // an exact bag-append (reference index.rs:7-9 semantics)
    val after = ExactKnn.topKAfterInsert(spark, sf0001, k = 10, nq = 20)
      .orderBy("qid", "rk").collect()
    val qids = after.map(_.getLong(0)).distinct.toSet
    val direct = ExactKnn.topKBatch(spark, sf0001, k = 10)
      .filter(org.apache.spark.sql.functions.col("qid").isin(qids.toSeq: _*))
      .orderBy("qid", "rk").collect()
    assert(after.nonEmpty && after.sameElements(direct))
  }

  test("a base point queried against the base returns itself first") {
    // exact-kNN self-query property (SURVEY.md §5.2)
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val self = base.filter(col("vec_id") === 7)
      .select(col("emb").as("qvec"))
    val top = base.crossJoin(broadcast(self))
      .select(col("vec_id"), ExactKnn.dist(col("emb"), col("qvec")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(1).head()
    assert(top.getLong(0) == 7 && top.getDouble(1) == 0.0)
  }

  test("MIPS single: descending scores, top-1 replays the max dot product") {
    val rows = ExactKnn.topKSingleMips(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 10)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2)
      case _ => ()
    }
    val (base, _, splitAt, n) = ExactKnn.split(spark, sf0001)
    val qid = splitAt + (29 % (n - splitAt))
    val qv = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === qid)
      .select(graft.functions.VectorFunctions.toDoubleArray(col("embedding")))
      .head().getSeq[Double](0).toArray
    val best = base.select(col("vec_id"), col("emb")).collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        val d = v.indices.map(i => v(i) * qv(i)).sum
        (r.getLong(0), math.rint(d * 1e6) / 1e6)
      }.maxBy(e => (e._2, -e._1))
    assert(rows.head._1 == best._1, s"${rows.head} vs $best")
  }

  test("hard negatives all carry a label different from their query's") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = ExactKnn.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, vid, _, _) =>
      assert(emb(vid) != emb(qid),
        s"negative $vid shares label ${emb(vid)} with query $qid")
    }
    // per query: ranks contiguous from 1, distances non-decreasing
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3)
        case _ => ()
      }
    }
  }

  test("after-delete search never returns a deleted vector") {
    val n = Tables.embeddings(spark, sf0001).count()
    val (s80, s90) = (math.round(0.8 * n), math.round(0.9 * n))
    val rows = ExactKnn.topKAfterDelete(spark, sf0001).collect()
      .map(_.getLong(1))
    assert(rows.nonEmpty)
    assert(!rows.exists(v => v >= s80 && v < s90),
      "a deleted vec_id surfaced in the after-delete search")
  }

  test("mutual kNN pairs replay a driver-side reciprocal filter") {
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val vecs = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val c = math.max(d / (math.sqrt(na) * math.sqrt(nb)), 0.0)
      BigDecimal(1 - c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val topk = vecs.keys.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, d) => (d, v) }.take(5)
    }.toMap
    val expect = (for {
      (a, nbrs) <- topk.toSeq; (b, d) <- nbrs
      if a < b && topk(b).exists(_._1 == a)
    } yield (a, b, d)).toSet
    val got = ExactKnn.mutualKnnPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, s"mutual pairs diverge: ${got.size} vs ${expect.size}")
    assert(got.nonEmpty)
    // mutuality strictly prunes the one-directional pair list
    val oneWay = topk.toSeq.flatMap { case (a, nbrs) =>
      nbrs.map { case (b, _) => (math.min(a, b), math.max(a, b)) } }.toSet
    assert(got.size < oneWay.size, "mutual filter pruned nothing")
  }
}
