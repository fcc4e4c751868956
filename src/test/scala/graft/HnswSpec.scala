package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, HnswIndex, HnswKnn}
import graft.operators.Evaluation

/** HNSW quality gates — the reference's own correctness mechanism is
  * online recall/precision vs the exact oracle
  * (`/root/reference/src/main.rs:89-93`); we pin it as tests.
  */
class HnswSpec extends SparkSpec {

  test("local index: self-query returns the point itself first") {
    val idx = new HnswIndex(seed = 7)
    val rnd = new scala.util.Random(1)
    val vecs = (0 until 200).map(i =>
      i.toLong -> Array.fill(16)(rnd.nextGaussian()))
    vecs.foreach { case (id, v) => idx.insert(id, v) }
    vecs.take(20).foreach { case (id, v) =>
      val hits = idx.search(v, 1)
      assert(hits.head._1 == id, s"self-query of $id returned ${hits.head}")
      assert(hits.head._2 < 1e-9)
    }
  }

  test("local index: search returns ascending distances, at most k") {
    val idx = new HnswIndex(seed = 11)
    val rnd = new scala.util.Random(2)
    (0 until 500).foreach(i => idx.insert(i.toLong, Array.fill(8)(rnd.nextGaussian())))
    val res = idx.search(Array.fill(8)(rnd.nextGaussian()), 10)
    assert(res.length == 10)
    assert(res.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(res.forall { case (_, d) => d >= 0.0 && d <= 1.0 })
  }

  test("local index: recall@10 vs brute force on gaussian data >= 0.9") {
    val rnd = new scala.util.Random(3)
    val base = (0 until 1000).map(i => i.toLong -> Array.fill(32)(rnd.nextGaussian()))
    val idx = new HnswIndex(seed = 5)
    base.foreach { case (id, v) => idx.insert(id, v) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      1.0 - math.max(d / (na * nb), 0.0)
    }
    val queries = (0 until 30).map(_ => Array.fill(32)(rnd.nextGaussian()))
    val recalls = queries.map { q =>
      val exact = base.map { case (id, v) => (cos(q, v), id) }.sorted.take(10).map(_._2).toSet
      val approx = idx.search(q, 10).map(_._1).toSet
      (exact intersect approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
  }

  test("heuristic selection (Alg 4): recall on CLUSTERED data >= 0.9 and >= simple - 0.05") {
    // clustered gaussians are the case Alg 4 exists for: simple selection
    // crowds all M links into the local cluster; the diversity rule keeps
    // cross-cluster links so navigation between clusters survives
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(32)(rnd.nextGaussian() * 3.0))
    def point() = {
      val c = centers(rnd.nextInt(centers.length))
      c.zip(Array.fill(32)(rnd.nextGaussian() * 0.3)).map { case (a, b) => a + b }
    }
    val base = (0 until 1200).map(i => i.toLong -> point())
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      1.0 - math.max(d / (na * nb), 0.0)
    }
    val queries = (0 until 40).map(_ => point())
    def meanRecall(idx: HnswIndex): Double = {
      val rs = queries.map { q =>
        val exact = base.map { case (id, v) => (cos(q, v), id) }.sorted.take(10).map(_._2).toSet
        val approx = idx.search(q, 10).map(_._1).toSet
        (exact intersect approx).size / 10.0
      }
      rs.sum / rs.size
    }
    val simple = new HnswIndex(seed = 5)
    val heur = new HnswIndex(seed = 5, heuristic = true)
    base.foreach { case (id, v) => simple.insert(id, v); heur.insert(id, v) }
    val (rs, rh) = (meanRecall(simple), meanRecall(heur))
    assert(rh >= 0.9, s"heuristic recall@10 = $rh")
    assert(rh >= rs - 0.05, s"heuristic $rh much worse than simple $rs")
  }

  test("sharded spark hnsw: every query answered with k ascending rows") {
    val df = HnswKnn.topKBatch(spark, sf0001, k = 10).cache()
    val (_, queries, _, _) = ExactKnn.split(spark, sf0001)
    val nq = queries.count()
    val perQ = df.groupBy("qid").count().collect()
    assert(perQ.length == nq)
    assert(perQ.forall(_.getLong(1) == 10))
    // rk dense 1..10 per query
    val bad = df.groupBy("qid").agg(min("rk").as("mn"), max("rk").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= 10).count()
    assert(bad == 0)
  }

  test("sharded spark hnsw: recall@10 vs exact oracle >= 0.85") {
    val hnsw = HnswKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val r = Evaluation.recall(hnsw, exact).collect()(0).getDouble(0)
    assert(r >= 0.85, s"recall@10 = $r")
    val p = Evaluation.precision(hnsw, exact).collect()(0).getDouble(0)
    assert(p >= 0.85, s"precision@10 = $p")
  }

  test("build-once search-many: persisted index answers repeated batches") {
    import spark.implicits._
    val (base, queries, _, _) = ExactKnn.split(spark, sf0001)
    val index = HnswKnn.buildIndex(base).persist()
    try {
      val qs = queries.as[(Long, Array[Double])].collect()
      val first = HnswKnn.searchIndex(index, qs.take(5)).collect().toSet
      val second = HnswKnn.searchIndex(index, qs.take(5)).collect().toSet
      assert(first == second, "same persisted index must answer identically")
      // a different batch against the same built graphs
      val third = HnswKnn.searchIndex(index, qs.drop(5).take(3))
      assert(third.select("qid").distinct().count() == 3)
    } finally index.unpersist()
  }

  test("incremental insert: new vectors become searchable in their shard") {
    import spark.implicits._
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val head = base.filter(col("vec_id") < 700)
    val tail = base.filter(col("vec_id") >= 700)
    // non-default shard count: the routing modulus travels inside the
    // index, so inserts land in the same shards the build used
    val built = HnswKnn.buildIndex(head, shards = 5)
    val extended = HnswKnn.insertIntoIndex(built, tail)
    assert(extended.shards == 5)
    val probe = tail.orderBy("vec_id").limit(3)
      .as[(Long, Array[Double])].collect()
      .map { case (id, v) => (id, v) }
    // querying with an inserted vector itself must return it at distance 0
    val hits = HnswKnn.searchIndex(extended, probe, k = 1)
      .select("qid", "vec_id", "dist").collect()
    probe.foreach { case (id, _) =>
      val row = hits.find(_.getLong(0) == id).get
      assert(row.getLong(1) == id && row.getDouble(2) == 0.0,
        s"inserted vector $id not its own nearest neighbor: $row")
    }
  }

  test("save/load round-trips the shard graphs bit-for-bit") {
    import spark.implicits._
    val (base, queries, _, _) = ExactKnn.split(spark, sf0001)
    val index = HnswKnn.buildIndex(base).persist()
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-hnsw").toString
      HnswKnn.saveIndex(index, dir)
      val loaded = HnswKnn.loadIndex(spark, dir)
      assert(loaded.shards == index.shards,
        "routing modulus must survive the checkpoint")
      val qs = queries.as[(Long, Array[Double])].collect().take(8)
      val before = HnswKnn.searchIndex(index, qs).collect().toSet
      val after = HnswKnn.searchIndex(loaded, qs).collect().toSet
      assert(before == after, "reloaded index must answer identically")
    } finally index.unpersist()
  }

  test("declared lifecycle query equals the in-memory batch, bit for bit") {
    val inMemory = HnswKnn.topKBatch(spark, sf0001).collect().toSet
    val lifecycle = HnswKnn.topKBatchLifecycle(spark, sf0001).collect().toSet
    assert(lifecycle == inMemory,
      "save->load->search must answer exactly like the in-memory index")
    assert(inMemory.nonEmpty)
  }

  test("filtered ANN: only-matching labels, k-bounded, recall vs exact") {
    val got = HnswKnn.topKBatchFiltered(spark, sf0001).cache()
    // every returned id must satisfy the predicate
    val emb = Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"))
    assert(got.join(emb, "vec_id")
      .filter(org.apache.spark.sql.functions.col("label") =!= 3).count() == 0)
    // bounded at k per query
    assert(got.groupBy("qid").count()
      .filter(org.apache.spark.sql.functions.col("count") > 10).count() == 0)
    val exact = ExactKnn.topKBatchFiltered(spark, sf0001)
      .select("qid", "vec_id")
    val recall = Evaluation.recall(got.select("qid", "vec_id"), exact)
      .head.getDouble(0)
    assert(recall >= 0.6, s"filtered recall $recall below 0.6")
    got.unpersist()
  }

  test("evaluation identities: recall(X,X) = precision(X,X) = 1.0") {
    val ex = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    assert(Evaluation.recall(ex, ex).collect()(0).getDouble(0) == 1.0)
    assert(Evaluation.precision(ex, ex).collect()(0).getDouble(0) == 1.0)
    val n = Evaluation.intersectionCount(ex, ex).collect()(0).getLong(0)
    assert(n == ex.count())
  }

  test("index stats: shards cover the base, degree bounds hold") {
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val rows = HnswKnn.indexStats(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._2.toLong).sum == base.count())
    rows.foreach { case (_, n, maxLvl, l0, tot, meanDeg) =>
      assert(maxLvl >= 0 && maxLvl <= 3) // maxLevel=4 -> levels 0..3
      assert(l0 <= n.toLong * 32, "layer-0 degree exceeds mMax bound")
      assert(tot >= l0 && (n <= 1 || meanDeg > 0.0))
    }
  }

  test("ef sweep: recall is monotone non-decreasing in ef") {
    val rows = Evaluation.hnswEfSweep(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(10, 50, 100)))
    rows.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b >= a - 1e-9, rows.mkString(","))
      case _ => ()
    }
    assert(rows.last._2 >= 0.85, s"recall@ef=100 ${rows.last._2}")
  }
}
