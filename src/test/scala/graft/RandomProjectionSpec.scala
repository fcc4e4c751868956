package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, RandomProjection}
import graft.operators.Evaluation

/** JL random-projection ANN: determinism + recall vs the exact oracle
  * (the reference's own quality-gate pattern, main.rs:89-93).
  */
class RandomProjectionSpec extends SparkSpec {

  test("projection is deterministic across runs") {
    val a = RandomProjection.topKBatch(spark, sf0001).collect()
    val b = RandomProjection.topKBatch(spark, sf0001).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(a.sortBy(key).sameElements(b.sortBy(key)))
  }

  test("recall@10 vs exact is high (overfetch 16x at 64->32 dims)") {
    val rp = RandomProjection.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val recall = Evaluation.recall(rp, exact).head.getDouble(0)
    assert(recall >= 0.7, s"recall $recall below 0.7")
  }

  test("each query returns exactly k ranked candidates") {
    val rows = RandomProjection.topKBatch(spark, sf0001, k = 5).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length == 5)
      assert(g.map(_.getInt(3)).sorted.sameElements(1 to 5))
    }
  }
}
