package graft

import graft.knn.{ExactKnn, PcaKnn}
import graft.operators.Evaluation

class PcaKnnSpec extends SparkSpec {

  test("the PCA basis is orthonormal (unit rows, zero cross dots)") {
    val m = PcaKnn.basis(spark, sf0001)
    assert(m.length == 32 && m.head.length == 64)
    for (i <- m.indices) {
      val ni = math.sqrt(m(i).map(x => x * x).sum)
      assert(math.abs(ni - 1.0) < 1e-9, s"row $i norm $ni")
      for (j <- (i + 1) until m.length) {
        val dot = m(i).zip(m(j)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-9, s"rows $i,$j dot $dot")
      }
    }
  }

  test("projection is deterministic across runs") {
    val a = PcaKnn.topKBatch(spark, sf0001).collect()
    val b = PcaKnn.topKBatch(spark, sf0001).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(a.sortBy(key).sameElements(b.sortBy(key)))
  }

  test("recall@10 vs exact is high (overfetch 16x at 64->32 dims)") {
    val pca = PcaKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val recall = Evaluation.recall(pca, exact).head.getDouble(0)
    assert(recall >= 0.7, s"recall $recall below 0.7")
  }

  test("each query returns exactly k ranked candidates") {
    val rows = PcaKnn.topKBatch(spark, sf0001, k = 5).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length == 5)
      assert(g.map(_.getInt(3)).sorted.sameElements(1 to 5))
    }
  }

  test("lifecycle search is bit-equal to the in-memory index") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3))
    val mem = PcaKnn.topKBatch(spark, sf0001).collect().sortBy(key)
    val ckpt = PcaKnn.topKBatchLifecycle(spark, sf0001).collect().sortBy(key)
    assert(mem.sameElements(ckpt) && mem.nonEmpty)
  }
}
