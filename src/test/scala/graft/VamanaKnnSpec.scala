package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, VamanaIndex, VamanaKnn}
import graft.operators.Evaluation

class VamanaKnnSpec extends SparkSpec {

  test("vamana index: exact on a hand fixture, degree-bounded") {
    val ix = new VamanaIndex(r = 4, lBuild = 8)
    // a 2-D fan: id i at angle i*10 degrees
    val pts = (0L until 12L).map { i =>
      val a = math.toRadians(i * 10.0)
      (i, Array(math.cos(a), math.sin(a)))
    }
    ix.build(pts.iterator)
    assert(ix.size == 12)
    val (nodes, edges, startId) = ix.stats
    assert(nodes == 12 && edges > 0 && startId >= 0)
    // graph search must find the true nearest neighbors of a probe
    // near id 3 (cosine distance is monotone in angle here)
    val probe = {
      val a = math.toRadians(31.0)
      Array(math.cos(a), math.sin(a))
    }
    val got = ix.search(probe, 3, ef = 8).map(_._1).toSeq
    assert(got == Seq(3L, 4L, 2L), s"got $got")
  }

  test("vamana: every query answered with k exact-set rows at high recall") {
    val df = VamanaKnn.topKBatch(spark, sf0001, k = 10).cache()
    val (_, queries, _, _) = ExactKnn.split(spark, sf0001)
    assert(df.select("qid").distinct().count() == queries.count())
    assert(df.groupBy("qid").count().collect().forall(_.getLong(1) == 10))
    assert(df.filter(col("dist") < 0 || col("dist") > 1).count() == 0)
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val r = Evaluation.recall(df.select("qid", "vec_id"), exact)
      .collect()(0).getDouble(0)
    assert(r >= 0.85, s"vamana recall@10 = $r")
  }

  test("vamana: deterministic reruns; lifecycle reload is bit-equal") {
    val a = VamanaKnn.topKBatch(spark, sf0001).collect().toSet
    val b = VamanaKnn.topKBatch(spark, sf0001).collect().toSet
    assert(a == b && a.nonEmpty)
    val reloaded = VamanaKnn.topKBatchLifecycle(spark, sf0001)
      .collect().toSet
    assert(reloaded == a)
  }
}
