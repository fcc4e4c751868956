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

  test("vamana after-insert: grown graphs recall the exact union") {
    val grown = VamanaKnn.topKAfterInsert(spark, sf0001)
      .select("qid", "vec_id").cache()
    val exact = ExactKnn.topKAfterInsert(spark, sf0001)
      .select("qid", "vec_id")
    val r = Evaluation.recall(grown, exact).collect()(0).getDouble(0)
    assert(r >= 0.85, s"after-insert recall@10 = $r")
    // inserted-slab vectors are reachable: some results come from the
    // 90-95% slab the insert added
    val (_, _, _, n) = {
      val (b, q, s, nn) = ExactKnn.split(spark, sf0001)
      (b, q, s, nn)
    }
    val s90 = math.round(0.90 * n)
    val s95 = math.round(0.95 * n)
    val fromSlab = grown.filter(col("vec_id") >= s90 &&
      col("vec_id") < s95).count()
    assert(fromSlab > 0, "no inserted vector ever surfaced in results")
    // deterministic rerun
    assert(VamanaKnn.topKAfterInsert(spark, sf0001).collect().toSet ==
      VamanaKnn.topKAfterInsert(spark, sf0001).collect().toSet)
  }

  test("vamana: deterministic reruns; lifecycle reload is bit-equal") {
    val a = VamanaKnn.topKBatch(spark, sf0001).collect().toSet
    val b = VamanaKnn.topKBatch(spark, sf0001).collect().toSet
    assert(a == b && a.nonEmpty)
    val reloaded = VamanaKnn.topKBatchLifecycle(spark, sf0001)
      .collect().toSet
    assert(reloaded == a)
  }

  test("beam sweep: recall is monotone non-decreasing in beam width") {
    val rows = Evaluation.vamanaBeamSweep(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(10, 50, 100)))
    rows.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b >= a - 1e-9, rows.mkString(","))
      case _ => ()
    }
    assert(rows.last._2 >= 0.85, s"recall@beam=100 ${rows.last._2}")
  }
}
